from handnet_tpu.ops import anchors as anchors
from handnet_tpu.ops import boxes as boxes
from handnet_tpu.ops import crop_resize as crop_resize
from handnet_tpu.ops import focal as focal
from handnet_tpu.ops import geometry as geometry
from handnet_tpu.ops import nms as nms
