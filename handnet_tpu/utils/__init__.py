from handnet_tpu.utils.meters import AverageMeter, SmoothedValue  # noqa: F401
from handnet_tpu.utils.monitoring import Metrics, Monitor  # noqa: F401
