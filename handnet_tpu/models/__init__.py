from handnet_tpu.models.a2j import A2J, a2j_loss, a2j_postprocess  # noqa: F401
from handnet_tpu.models.fcos import FCOS  # noqa: F401
