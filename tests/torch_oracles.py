"""From-scratch PyTorch replicas of the reference architectures, used as
in-sandbox parity oracles.

The sandbox has torch (cpu) but neither torchvision nor the reference's
published checkpoints, so true golden-fixture parity can't run here
(tests/test_golden_parity.py skips). These replicas close that gap: they are
written from scratch against the reference's *state-dict layout and forward
semantics* (cited per class), randomly initialized, exported as torch state
dicts, pushed through convert/torch_weights.py, and compared against the flax
models — proving converter + model-semantics parity end to end without the
real artifacts.

These are test oracles, not product code; they intentionally mirror the
reference's module names so the converters see realistic keys.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def randomize_(model: nn.Module, seed: int = 0, scale: float = 0.1) -> None:
    """Random params AND random (positive-var) BN running stats so eval-mode
    parity actually exercises the statistics conversion."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * scale)
        for m in model.modules():
            if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=gen) * scale)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=gen) * 0.5 + 0.5)
            if isinstance(m, nn.GroupNorm):
                pass


def state_dict_numpy(model: nn.Module) -> dict:
    return {k: v.detach().numpy() for k, v in model.state_dict().items()
            if v.dtype != torch.int64}


# ---------------------------------------------------------------------------
# ResNet-50 trunk with torchvision state-dict names (conv1/bn1/layer{1-4})
# ---------------------------------------------------------------------------

class _Bottleneck(nn.Module):
    """Torchvision-layout bottleneck; stride on the 3x3 (a2j/resnet.py:64-96)."""

    expansion = 4

    def __init__(self, cin, planes, stride=1, dilation=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idn)


class TorchResNet50(nn.Module):
    """ResNet-50 trunk emitting (c4, c5); torchvision key names.

    ``dilated=True`` reproduces the a2j variant: layer4 stride 1, and — the
    reference's _make_layer quirk (a2j/resnet.py:133-145) — dilation 2 only on
    blocks AFTER the first of layer4.
    """

    def __init__(self, in_ch=3, dilated=False):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        cfg = [(64, 3, 1, 1), (128, 4, 2, 1), (256, 6, 2, 1),
               (512, 3, 1 if dilated else 2, 2 if dilated else 1)]
        cin = 64
        for idx, (planes, blocks, stride, dil) in enumerate(cfg):
            layers = []
            for j in range(blocks):
                down = None
                s = stride if j == 0 else 1
                if j == 0 and (s != 1 or cin != planes * 4):
                    down = nn.Sequential(
                        nn.Conv2d(cin, planes * 4, 1, stride=s, bias=False),
                        nn.BatchNorm2d(planes * 4))
                layers.append(_Bottleneck(cin, planes, s,
                                          dil if j > 0 else 1, down))
                cin = planes * 4
            setattr(self, f"layer{idx + 1}", nn.Sequential(*layers))
        self.fc = nn.Linear(2048, 1000)  # present in checkpoints, unused

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        x = self.layer1(x)
        x = self.layer2(x)
        c4 = self.layer3(x)
        c5 = self.layer4(c4)
        return c4, c5


# ---------------------------------------------------------------------------
# A2J (a2j/a2j.py:44-250)
# ---------------------------------------------------------------------------

class _A2JHead(nn.Module):
    """4x(conv3x3+BN+ReLU) + output conv (a2j/a2j.py:44-181)."""

    def __init__(self, cin, cout, feat=256):
        super().__init__()
        for i in range(1, 5):
            setattr(self, f"conv{i}", nn.Conv2d(cin if i == 1 else feat, feat,
                                                3, padding=1))
            setattr(self, f"bn{i}", nn.BatchNorm2d(feat))
        self.output = nn.Conv2d(feat, cout, 3, padding=1)

    def forward(self, x):
        for i in range(1, 5):
            x = F.relu(getattr(self, f"bn{i}")(getattr(self, f"conv{i}")(x)))
        return self.output(x)


class _Wrap(nn.Module):
    def __init__(self, model):
        super().__init__()
        self.model = model


class TorchA2J(nn.Module):
    """Reference A2JModel layout (a2j/a2j.py:212-250): Backbone.model = dilated
    resnet50; heads named {classification,regression,DepthRegression}Model.
    Forward reproduces the reference's permute(0,3,2,1) flattening
    (a2j/a2j.py:86-89,131-135,178-183) so the anchor pairing quirk is live.
    """

    def __init__(self, num_joints=21, num_anchors=16):
        super().__init__()
        self.p = num_joints
        self.a = num_anchors
        self.Backbone = _Wrap(TorchResNet50(in_ch=3, dilated=True))
        self.classificationModel = _A2JHead(1024, num_anchors * num_joints)
        self.regressionModel = _A2JHead(2048, num_anchors * num_joints * 2)
        self.DepthRegressionModel = _A2JHead(2048, num_anchors * num_joints)

    def _flat(self, t, trailing):
        b = t.shape[0]
        t = t.permute(0, 3, 2, 1)  # [B, W, H, C]
        return t.reshape((b, -1, self.p) + trailing)

    def forward(self, depth):
        # depth [B, 1, H, W] -> 3-channel repeat (a2j/a2j.py:197-199)
        x = depth.expand(-1, 3, -1, -1)
        c4, c5 = self.Backbone.model(x)
        cls = self._flat(self.classificationModel(c4), ())
        reg = self._flat(self.regressionModel(c5), (2,))
        dep = self._flat(self.DepthRegressionModel(c5), ())
        return cls, reg, dep


def torch_a2j_anchors(feat_h=11, feat_w=11, stride=16,
                      offs=(2, 6, 10, 14)) -> np.ndarray:
    """Reference anchor table (a2j/anchor.py:7-42): w-major flat order,
    channel0 = row grid, channel1 = column grid."""
    offs = np.asarray(offs, np.float32)
    n = len(offs)
    cell = np.zeros((n * n, 2), np.float32)
    k = 0
    for i in range(n):
        for j in range(n):
            cell[k] = (offs[i], offs[j])
            k += 1
    rows = []
    for w in range(feat_w):
        for h in range(feat_h):
            shift = np.array([h * stride, w * stride], np.float32)
            rows.append(cell + shift)
    return np.concatenate(rows, 0)


def torch_a2j_decode(cls, reg, dep, anchors) -> np.ndarray:
    """Reference post_process (a2j/anchor.py:57-82): per-joint softmax over
    anchors, weighted sum of (anchor + offset) and of depth."""
    w = torch.softmax(cls, dim=1)                       # [B, N, P]
    pos = torch.as_tensor(anchors)[None, :, None, :] + reg
    xy = (w.unsqueeze(-1) * pos).sum(dim=1)             # [B, P, 2]
    d = (w * dep).sum(dim=1)                            # [B, P]
    return torch.cat([xy, d.unsqueeze(-1)], dim=-1).numpy()


# ---------------------------------------------------------------------------
# FCOS (fcos_utils/fcos.py:203-520): resnet34 + FPN + shared GN towers
# ---------------------------------------------------------------------------

class _BasicBlock(nn.Module):
    """Torchvision-layout basic block (resnet34)."""

    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idn)


class TorchResNet34(nn.Module):
    """ResNet-34 trunk emitting (c3, c4, c5); torchvision key names."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        cin = 64
        for idx, (planes, blocks, stride) in enumerate(
                [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]):
            layers = []
            for j in range(blocks):
                s = stride if j == 0 else 1
                down = None
                if j == 0 and (s != 1 or cin != planes):
                    down = nn.Sequential(
                        nn.Conv2d(cin, planes, 1, stride=s, bias=False),
                        nn.BatchNorm2d(planes))
                layers.append(_BasicBlock(cin, planes, s, down))
                cin = planes
            setattr(self, f"layer{idx + 1}", nn.Sequential(*layers))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        x = self.layer1(x)
        c3 = self.layer2(x)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c3, c4, c5


class _TorchFPN(nn.Module):
    """Torchvision FPN over 3 levels (lateral 1x1 + nearest top-down + 3x3),
    key names inner_blocks.{i} / layer_blocks.{i}; the reference discards the
    LastLevelMaxPool extra level (fcos.py:742) so we don't build it."""

    def __init__(self, in_channels=(128, 256, 512), out=256):
        super().__init__()
        self.inner_blocks = nn.ModuleList(
            [nn.Conv2d(c, out, 1) for c in in_channels])
        self.layer_blocks = nn.ModuleList(
            [nn.Conv2d(out, out, 3, padding=1) for _ in in_channels])

    def forward(self, feats):
        laterals = [blk(f) for blk, f in zip(self.inner_blocks, feats)]
        out = [laterals[-1]]
        for i in range(len(laterals) - 2, -1, -1):
            up = F.interpolate(out[0], size=laterals[i].shape[-2:],
                               mode="nearest")
            out.insert(0, laterals[i] + up)
        return [blk(o) for blk, o in zip(self.layer_blocks, out)]


class _FPNBackbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.body = TorchResNet34()
        self.fpn = _TorchFPN()

    def forward(self, x):
        return self.fpn(self.body(x))


def _flatten_hwc(t, k):
    """(N, A*K, H, W) -> (N, HWA, K), the reference's permute flattening
    (fcos.py:283-288); A=1 here."""
    n, _, h, w = t.shape
    return t.permute(0, 2, 3, 1).reshape(n, h * w, k)


class _TorchFCOSClsHead(nn.Module):
    """fcos.py:203-330 — shared GN tower + cls/lr/contact/dxdy outputs."""

    def __init__(self, channels, num_classes, ext=True):
        super().__init__()
        self.ext = ext
        self.num_classes = num_classes
        seq = []
        for _ in range(4):
            seq += [nn.Conv2d(channels, channels, 3, padding=1),
                    nn.GroupNorm(32, channels), nn.ReLU()]
        self.conv = nn.Sequential(*seq)
        self.cls_logits = nn.Conv2d(channels, num_classes, 3, padding=1)
        self.hand_lr_layer = nn.Conv2d(channels, 2, 3, padding=1)
        if ext:
            self.hand_contact_state_layer = nn.Conv2d(channels, 5, 3,
                                                      padding=1)
            self.hand_dydx_layer = nn.Conv2d(channels, 3, 3, padding=1)

    def forward(self, feats):
        cls, lr, contact, dxdy = [], [], [], []
        for f in feats:
            t = self.conv(f)
            cls.append(_flatten_hwc(self.cls_logits(t), self.num_classes))
            lr.append(_flatten_hwc(self.hand_lr_layer(t), 2))
            if self.ext:
                contact.append(
                    _flatten_hwc(self.hand_contact_state_layer(t), 5))
                # relu, then 0.1 * L2-normalize of the (dx,dy) channels,
                # magnitude channel kept raw (fcos.py:301-303)
                d = F.relu(self.hand_dydx_layer(t))
                vec = 0.1 * F.normalize(d[:, 1:], p=2, dim=1)
                d = torch.cat([d[:, :1], vec], dim=1)
                dxdy.append(_flatten_hwc(d, 3))
        out = {"cls_logits": torch.cat(cls, 1), "hand_lr": torch.cat(lr, 1)}
        if self.ext:
            out["hand_contact_state"] = torch.cat(contact, 1)
            out["hand_dxdy"] = torch.cat(dxdy, 1)
        return out


class _TorchFCOSRegHead(nn.Module):
    """fcos.py:333-395 — shared GN tower + relu(bbox_reg) + ctrness."""

    def __init__(self, channels):
        super().__init__()
        seq = []
        for _ in range(4):
            seq += [nn.Conv2d(channels, channels, 3, padding=1),
                    nn.GroupNorm(32, channels), nn.ReLU()]
        self.conv = nn.Sequential(*seq)
        self.bbox_reg = nn.Conv2d(channels, 4, 3, padding=1)
        self.bbox_ctrness = nn.Conv2d(channels, 1, 3, padding=1)

    def forward(self, feats):
        reg, ctr = [], []
        for f in feats:
            t = self.conv(f)
            reg.append(_flatten_hwc(F.relu(self.bbox_reg(t)), 4))
            ctr.append(_flatten_hwc(self.bbox_ctrness(t), 1))
        return {"bbox_regression": torch.cat(reg, 1),
                "bbox_ctrness": torch.cat(ctr, 1)}


class _TorchFCOSHead(nn.Module):
    def __init__(self, channels, num_classes, ext=True):
        super().__init__()
        self.classification_head = _TorchFCOSClsHead(channels, num_classes,
                                                     ext)
        self.regression_head = _TorchFCOSRegHead(channels)

    def forward(self, feats):
        out = dict(self.classification_head(feats))
        out.update(self.regression_head(feats))
        return out


class TorchFCOS(nn.Module):
    """Reference FCOS network layout (fcos.py:455-520) minus the dynamic
    GeneralizedRCNNTransform — forward takes pre-normalized static-size
    NCHW tensors, returning flat head outputs for direct comparison."""

    def __init__(self, num_classes=3, ext=True):
        super().__init__()
        self.backbone = _FPNBackbone()
        self.head = _TorchFCOSHead(256, num_classes, ext)

    def forward(self, x):
        return self.head(self.backbone(x))


# ---------------------------------------------------------------------------
# MANO LBS (dex-ycb-toolkit/manopth/manopth/manolayer.py:110-274)
# ---------------------------------------------------------------------------

def _rodrigues_t(aa: torch.Tensor) -> torch.Tensor:
    """Axis-angle [N, 3] -> rotation matrices [N, 3, 3]."""
    angle = torch.linalg.norm(aa, dim=1, keepdim=True).clamp_min(1e-8)
    axis = aa / angle
    x, y, z = axis.unbind(1)
    zero = torch.zeros_like(x)
    k = torch.stack([zero, -z, y, z, zero, -x, -y, x, zero],
                    dim=1).reshape(-1, 3, 3)
    a = angle.unsqueeze(-1)
    eye = torch.eye(3).expand(len(aa), 3, 3)
    return eye + torch.sin(a) * k + (1 - torch.cos(a)) * (k @ k)


class TorchManoLayer:
    """Sequential-per-finger torch replica of the reference ManoLayer forward
    (manolayer.py:110-274): PCA pose -> rodrigues -> blendshapes -> 3-level
    chains -> LBS -> tips + reorder -> mm. Takes the same asset arrays as
    handnet_tpu.models.mano.ManoAssets, so parity runs on synthetic assets."""

    REORDER = [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18,
               10, 11, 12, 19, 7, 8, 9, 20]
    TIPS = {"right": [745, 317, 444, 556, 673],
            "left": [745, 317, 445, 556, 673]}

    def __init__(self, assets, ncomps=45, flat_hand_mean=False):
        t = lambda x: torch.as_tensor(np.asarray(x), dtype=torch.float64)
        self.shapedirs = t(assets.shapedirs)       # [V, 3, 10]
        self.posedirs = t(assets.posedirs)         # [V, 3, 135]
        self.v_template = t(assets.v_template)
        self.J_regressor = t(assets.J_regressor)
        self.weights = t(assets.weights)
        self.comps = t(assets.hands_components[:ncomps])
        self.mean = (torch.zeros(45, dtype=torch.float64) if flat_hand_mean
                     else t(assets.hands_mean))
        self.side = assets.side
        self.n_verts = self.v_template.shape[0]

    def __call__(self, pose_coeffs, betas, trans):
        pose_coeffs = torch.as_tensor(pose_coeffs, dtype=torch.float64)
        betas = torch.as_tensor(betas, dtype=torch.float64)
        trans = torch.as_tensor(trans, dtype=torch.float64)
        b = pose_coeffs.shape[0]
        full_hand = pose_coeffs[:, 3:] @ self.comps + self.mean
        full_pose = torch.cat([pose_coeffs[:, :3], full_hand], 1)
        rots = _rodrigues_t(full_pose.reshape(-1, 3)).reshape(b, 16, 3, 3)
        pose_map = (rots[:, 1:] - torch.eye(3, dtype=torch.float64)
                    ).reshape(b, 135)

        v_shaped = (torch.einsum("vcs,bs->bvc", self.shapedirs, betas)
                    + self.v_template)
        j_rest = torch.einsum("jv,bvc->bjc", self.J_regressor, v_shaped)
        v_posed = v_shaped + torch.einsum("vcp,bp->bvc", self.posedirs,
                                          pose_map)

        def with_zeros(rt):  # [..., 3, 4] -> [..., 4, 4]
            pad = torch.tensor([0.0, 0, 0, 1], dtype=torch.float64).expand(
                rt.shape[:-2] + (1, 4))
            return torch.cat([rt, pad], dim=-2)

        # sequential chain walk, one finger at a time (manolayer.py:209-228)
        chains = {1: [1, 2, 3], 4: [4, 5, 6], 7: [7, 8, 9],
                  10: [10, 11, 12], 13: [13, 14, 15]}
        results = [None] * 16
        root = with_zeros(torch.cat([rots[:, 0], j_rest[:, 0:1].transpose(
            1, 2)], 2))
        results[0] = root
        for chain in chains.values():
            parent_tf, parent_j = root, j_rest[:, 0]
            for idx in chain:
                local = with_zeros(torch.cat(
                    [rots[:, idx],
                     (j_rest[:, idx] - parent_j).unsqueeze(-1)], 2))
                results[idx] = parent_tf @ local
                parent_tf, parent_j = results[idx], j_rest[:, idx]
        tf = torch.stack(results, dim=1)                  # [B, 16, 4, 4]

        j_h = torch.cat([j_rest, torch.zeros(b, 16, 1, dtype=torch.float64)],
                        2)
        tmp = (tf @ j_h.unsqueeze(-1))                    # [B, 16, 4, 1]
        rel = tf - torch.cat([torch.zeros(b, 16, 4, 3, dtype=torch.float64),
                              tmp], 3)
        T = torch.einsum("bjik,vj->bvik", rel, self.weights)
        v_h = torch.cat([v_posed, torch.ones(b, self.n_verts, 1,
                                             dtype=torch.float64)], 2)
        verts = torch.einsum("bvik,bvk->bvi", T, v_h)[..., :3]
        joints = tf[:, :, :3, 3]
        joints = torch.cat([joints, verts[:, self.TIPS[self.side]]], 1)
        joints = joints[:, self.REORDER]
        joints = joints + trans.unsqueeze(1)
        verts = verts + trans.unsqueeze(1)
        return (verts * 1000.0).numpy(), (joints * 1000.0).numpy()


# ---------------------------------------------------------------------------
# FlatPose2Mesh (pose2mesh/lib/models/*)
# ---------------------------------------------------------------------------

class _LinearStage(nn.Module):
    """posenet.py:11-38 residual block (bn->relu->drop->linear, twice)."""

    def __init__(self, size):
        super().__init__()
        self.w1 = nn.Linear(size, size)
        self.batch_norm1 = nn.BatchNorm1d(size)
        self.w2 = nn.Linear(size, size)
        self.batch_norm2 = nn.BatchNorm1d(size)

    def forward(self, x):
        y = self.w1(F.relu(self.batch_norm1(x)))
        y = self.w2(F.relu(self.batch_norm2(y)))
        return x + y


class _TorchPoseNet(nn.Module):
    """posenet.py:41-98 LinearModel. Includes the constructed-but-unused
    top-level batch_norm1 (posenet.py:60) so converters must skip it."""

    def __init__(self, num_joints, hid=4096, stages=2):
        super().__init__()
        self.w1 = nn.Linear(num_joints * 2, hid)
        self.batch_norm1 = nn.BatchNorm1d(hid)          # dead module
        self.linear_stages = nn.ModuleList(
            [_LinearStage(hid) for _ in range(stages)])
        self.w2 = nn.Linear(hid, num_joints * 3)

    def forward(self, x):
        y = self.w1(x)
        for stage in self.linear_stages:
            y = stage(y)
        return self.w2(y)


class _TorchMeshNet(nn.Module):
    """meshnet.py:11-117 coarse-to-fine Chebyshev GCN, dense Laplacians.

    ``laplacians``: the pyramid list AFTER the reference's del graph_L[-2]
    (fine -> coarse mesh levels, then the joint graph last).
    """

    CHANNELS = [(5, 32, 64, 64), (64, 128, 256), (256, 256, 256),
                (256, 256, 256), (256, 256, 256), (256, 128, 128),
                (128, 64, 3)]

    def __init__(self, laplacians, k=3):
        super().__init__()
        self.k = k
        self.L = [torch.as_tensor(np.asarray(l), dtype=torch.float32)
                  for l in laplacians]
        joint_nodes = self.L[-1].shape[0]
        up_nodes = self.L[-2].shape[0]
        self.fc = nn.Linear(joint_nodes * self.CHANNELS[0][-1],
                            up_nodes * self.CHANNELS[1][0])
        cl, bn = [], {}
        n_blocks = len(self.CHANNELS)
        for i, chans in enumerate(self.CHANNELS):
            for li in range(len(chans) - 1):
                cl.append(nn.Linear(k * chans[li], chans[li + 1]))
                last = (i == n_blocks - 1 and li == len(chans) - 2)
                if not last:
                    bn[str(len(cl) - 1)] = nn.BatchNorm1d(chans[li + 1])
        self.cl = nn.ModuleList(cl)
        self.bn = nn.ModuleDict(bn)   # keys 'bn.{i}' like the ref ModuleList

    def _cheby(self, x, L, idx):
        terms = [x]
        if self.k > 1:
            terms.append(torch.einsum("vu,buf->bvf", L, x))
        for _ in range(2, self.k):
            terms.append(2 * torch.einsum("vu,buf->bvf", L, terms[-1])
                         - terms[-2])
        flat = torch.stack(terms, dim=-1).reshape(
            x.shape[0], x.shape[1], -1)   # Fin-major, K-minor
        y = self.cl[idx](flat)
        if str(idx) in self.bn:
            b, v, f = y.shape
            y = self.bn[str(idx)](y.reshape(b * v, f)).reshape(b, v, f)
        return y

    def forward(self, x):
        n_blocks = len(self.CHANNELS)
        li = 0
        for i, chans in enumerate(self.CHANNELS):
            ldx = -(i + 1) if i < n_blocks - 1 else -(i + 1) + 1
            input_x = x
            for layer_i in range(len(chans) - 1):
                x = self._cheby(x, self.L[ldx], li)
                last = (i == n_blocks - 1 and layer_i == len(chans) - 2)
                if not last:
                    x = F.relu(x)
                li += 1
            if i == 0:
                x = self.fc(x.reshape(x.shape[0], -1))
                x = x.reshape(-1, self.L[-2].shape[0], self.CHANNELS[1][0])
            elif i < n_blocks - 2:
                res = F.interpolate(input_x, size=x.shape[2], mode="linear")
                x = res + x
                x = x.repeat_interleave(2, dim=1)  # nearest 2x graph upsample
            elif i == n_blocks - 2:
                res = F.interpolate(input_x, size=x.shape[2], mode="linear")
                x = res + x
        return x


class TorchFlatPose2Mesh(nn.Module):
    """pose2mesh_net.py:8-28: lifter + GCN, detached pose3d/1000 concat."""

    def __init__(self, laplacians, num_joints=21, hid=4096, stages=2):
        super().__init__()
        self.num_joints = num_joints
        self.pose_lifter = _TorchPoseNet(num_joints, hid, stages)
        self.pose2mesh = _TorchMeshNet(laplacians)

    def forward(self, pose2d):
        b = pose2d.shape[0]
        pose3d = self.pose_lifter(pose2d.reshape(b, -1))
        pose3d = pose3d.reshape(b, self.num_joints, 3)
        combined = torch.cat([pose2d, pose3d.detach() / 1000.0], dim=2)
        return self.pose2mesh(combined), pose3d
