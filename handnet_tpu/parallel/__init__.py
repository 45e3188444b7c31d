from handnet_tpu.parallel.mesh import (create_mesh, data_sharding,  # noqa: F401
                                       replicate_sharding)
