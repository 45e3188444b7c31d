from handnet_tpu.train.schedules import (multistep_with_warmup,  # noqa: F401
                                         step_decay)
from handnet_tpu.train.trainer import A2JTrainer, FCOSTrainer  # noqa: F401
