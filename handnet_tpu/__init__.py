"""handnet_tpu — TPU-native rebuild of the HandNet two-stage RGB-D hand perception stack.

A JAX/XLA/Pallas re-design (not a port) of IRVLUTD/handnet-pipeline:

* FCOS (anchor-free detector, ResNet-34+FPN) finds the hand box in RGB
  (reference: fcos_utils/fcos.py:398-767).
* The box is padded 40% and the depth frame is cropped+resized to 176x176 on device
  (reference: handnet_pipeline/handnet_pipeline.py:88-105).
* A2J (anchor-to-joint regression, ResNet-50) regresses 21 joints in UVD
  (reference: a2j/a2j.py:212-250, a2j/anchor.py:44-82).
* UVD -> XYZ unprojection through camera intrinsics (reference: datasets3d/a2jdataset.py:31-38).
* Optional Pose2Mesh graph-convnet lifts joints to a 778-vertex MANO mesh
  (reference: pose2mesh/lib/models/pose2mesh_net.py).

Everything on the compute path is fixed-shape and jit-compiled: detections are
max-K + validity mask, NMS is an on-device O(K^2) suppression, the detect->crop
handoff is a dynamic gather (no host round trip), and the A2J anchor aggregation
is a single fused einsum instead of the reference's per-image python loop.
"""

__version__ = "0.1.0"

from handnet_tpu import config as config  # noqa: F401
