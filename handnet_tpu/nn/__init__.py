from handnet_tpu.nn.resnet import ResNet, resnet18, resnet34, resnet50  # noqa: F401
from handnet_tpu.nn.fpn import FPN  # noqa: F401
