"""Single dataclass config tree for the whole framework.

The reference juggles four config systems (argparse flags in utils/argutils.py,
Lightning YAML in config/a2j.yaml, the easydict cfg tree in
lib/model/utils/config.py:11-399, and pose2mesh/lib/core/config.py:17-109).
Here there is exactly one: frozen dataclasses, overridable from YAML/dict.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


@dataclass(frozen=True)
class A2JConfig:
    """A2J pose regressor (reference: a2j/a2j.py:212-224, config/a2j.yaml)."""

    num_joints: int = 21
    crop_h: int = 176
    crop_w: int = 176
    in_channels: int = 1           # 1 = depth, 4 = RGBD (reference a2j/a2j.py:216)
    backbone: str = "resnet50"
    stride: int = 16
    # 16 anchors per cell at offsets {2,6,10,14}^2 (reference a2j/anchor.py:7-24)
    anchor_offsets: Tuple[int, ...] = (2, 6, 10, 14)
    head_features: int = 256
    spatial_factor: float = 0.5    # reg loss spatial scale (reference a2j/anchor.py:140)
    reg_loss_factor: float = 3.0   # reference a2j/a2j.py:224
    is_3d: bool = True
    # Reference checkpoints pair regression channel 0 with the *row* grid because of
    # the permute(0,3,2,1) in its heads (reference a2j/a2j.py:86-89). Set True when
    # loading converted torch weights; False for clean training from scratch.
    transposed_anchors: bool = False
    # int8 serving path (nn/quant.py): backbone + head tower convs run
    # int8xint8->int32 on the MXU (2x bf16 TOPs on v5e). Inference-only —
    # trainers force it off; params are unchanged (train bf16, serve int8).
    # False = float; True/"dynamic" = per-sample scales; "static" =
    # calibrated per-layer scales (quant_stats collection).
    quant: Any = False

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_offsets) ** 2

    @property
    def feat_h(self) -> int:
        return self.crop_h // self.stride

    @property
    def feat_w(self) -> int:
        return self.crop_w // self.stride


@dataclass(frozen=True)
class FCOSConfig:
    """FCOS hand detector (reference: fcos_utils/fcos.py:455-511)."""

    num_classes: int = 3           # trainval uses 3; pipeline detector uses 2
    ext: bool = True               # 100DOH extension heads (contact/dxdy)
    backbone: str = "resnet34"
    fpn_channels: int = 256
    strides: Tuple[int, ...] = (8, 16, 32)
    num_convs: int = 4
    prior_prob: float = 0.01
    # Static input size replacing GeneralizedRCNNTransform's dynamic min/max resize
    # (reference fcos.py:501-505: min 800 / max 1333). 480x640 frames scale to
    # 800x1067; we pad W to a multiple of 32.
    image_h: int = 800
    image_w: int = 1088
    image_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    image_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    center_sampling_radius: float = 1.5
    score_thresh: float = 0.7      # hard mask in postprocess (reference fcos.py:600)
    nms_thresh: float = 0.6        # ctor default; pipeline passes 0.5, postprocess uses 0.3
    post_nms_thresh: float = 0.3   # reference fcos.py:635
    max_detections: int = 64       # static detection budget (pad + validity mask)
    # Space-to-depth stem transform (mathematically exact; nn/resnet.py
    # StemConv). Measured on v5e-1: NO gain over the plain stem (448 vs
    # 451 fps parity profile — XLA already lowers the 7x7/s2 stem well), so
    # default OFF; kept as a tested option for other hardware generations.
    s2d_stem: bool = False
    # int8 serving path (nn/quant.py): backbone + FPN + tower convs run
    # int8xint8->int32 on the MXU (2x bf16 TOPs on v5e); prediction convs
    # stay float. Inference-only — trainers force it off. False = float;
    # True/"dynamic" = per-sample scales; "static" = calibrated per-layer
    # scales (quant_stats collection; see HandNetPipeline.calibrate).
    quant: Any = False
    # Single-pass GN variance (flax use_fast_variance: E[x^2] - E[x]^2) in
    # the head towers. Measured on v5e-1: 5.9-9.3x over the exact two-pass
    # GN at fast shapes standalone (tools/gn_pallas_probe.py) and +5%
    # e2e-pipeline fps on BOTH the fast and quant_static profiles
    # (tools/bench_gn_matrix.py, 2026-08-20) — shipped ON in the serving
    # yamls (fast/turbo/quant/quant_static; parity stays reference-exact).
    # SERVING-ONLY: the cancellation form can go negative under fp once
    # activations grow and rsqrt(neg) NaNs gradients mid-training (observed
    # at ~step 80) — trainers force it off. Parameters are identical either
    # way, so train exact / serve fast needs no conversion.
    # (A single-HBM-read pallas stats kernel, ops/pallas_gn.py, won 13-67x
    # standalone but LOST in-pipeline — the pallas_call is a fusion barrier
    # for the tower convs' epilogues — so its serving flag was removed;
    # the kernel + probe + unit tests remain as standalone ops.)
    gn_fast_variance: bool = False


@dataclass(frozen=True)
class PipelineConfig:
    """Fused detect->crop->pose pipeline (reference handnet_pipeline/handnet_pipeline.py)."""

    pad_percent: float = 0.4       # reference handnet_pipeline.py:93
    crop_size: int = 176
    rgbd: bool = False
    hand_label: Optional[int] = None  # default: num_classes - 1 (reference :74)
    # Fuse the Pose2Mesh lifting head into the serving graph: one jitted
    # frame -> joints -> 778-vert MANO-topology mesh path (the reference runs
    # pose2mesh per frame on the host, ros_demo.py:131-168 predict_mesh).
    with_mesh: bool = False
    # Static-int8 calibration headroom: every calibrated activation amax is
    # widened by (1 + quant_margin) before serving (nn/quant.apply_margin).
    # Out-of-calibration-range activations saturate at ±127; the margin
    # buys immunity to moderate distribution shift (brighter/higher-contrast
    # frames than calibration saw) at the price of a (1+m)x coarser int8
    # step in range. Default from tools/int8_saturation_study.py's measured
    # curve. Only consulted by HandNetPipeline.calibrate for quant="static".
    quant_margin: float = 0.1


@dataclass(frozen=True)
class ManoConfig:
    """MANO hand LBS model (reference: manopth/manolayer.py:13-274)."""

    ncomps: int = 45
    flat_hand_mean: bool = False
    center_idx: Optional[int] = None
    use_pca: bool = True


@dataclass(frozen=True)
class Pose2MeshConfig:
    """Pose2Mesh lifter+GCN (reference: pose2mesh/lib/models/*)."""

    num_joints: int = 21
    posenet_hid: int = 4096
    posenet_stages: int = 2
    dropout: float = 0.5
    cheby_order: int = 3
    num_mesh_verts: int = 778


@dataclass(frozen=True)
class TrainConfig:
    """Optimization recipes (reference config/a2j.yaml:8-30, trainval_net_fcos.py:195-204)."""

    batch_size: int = 64
    lr: float = 3.5e-4
    weight_decay: float = 1e-4
    epochs: int = 45
    lr_step: int = 10
    lr_gamma: float = 0.2
    warmup_epochs: int = 0
    optimizer: str = "adamw"
    bf16: bool = True
    seed: int = 0
    # data parallel axis size; None = all local devices
    dp_devices: Optional[int] = None


@dataclass(frozen=True)
class HandNetConfig:
    a2j: A2JConfig = field(default_factory=A2JConfig)
    fcos: FCOSConfig = field(default_factory=FCOSConfig)
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    mano: ManoConfig = field(default_factory=ManoConfig)
    pose2mesh: Pose2MeshConfig = field(default_factory=Pose2MeshConfig)
    train: TrainConfig = field(default_factory=TrainConfig)


def _replace_recursive(cfg: Any, overrides: Dict[str, Any]) -> Any:
    kwargs = {}
    for key, value in overrides.items():
        if not hasattr(cfg, key):
            raise KeyError(f"unknown config key {key!r} for {type(cfg).__name__}")
        current = getattr(cfg, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            kwargs[key] = _replace_recursive(current, value)
        else:
            kwargs[key] = type(current)(value) if isinstance(current, tuple) else value
    return dataclasses.replace(cfg, **kwargs)


def load_config(overrides: Optional[Dict[str, Any]] = None,
                yaml_path: Optional[str] = None) -> HandNetConfig:
    """Build a config, optionally merged from a YAML file and/or a dict."""
    cfg = HandNetConfig()
    if yaml_path is not None:
        import yaml  # lazy; pyyaml ships with the base image

        with open(yaml_path) as f:
            file_overrides = yaml.safe_load(f) or {}
        cfg = _replace_recursive(cfg, file_overrides)
    if overrides:
        cfg = _replace_recursive(cfg, overrides)
    return cfg
