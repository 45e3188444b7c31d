"""Evaluator parity against the reference's OWN code, imported at test time.

Companion to tests/test_reference_parity.py (model stack); this file
de-correlates the EVALUATION stack by driving the reference's actual
evaluator sources from the read-only mount (never copied) on randomized
scenarios and asserting this package's in-memory evaluators produce the
same numbers:

* lib/datasets/voc_eval.py voc_eval + voc_eval_hand (all 4 constraints),
  through the reference's real file protocol: VOC XML annotations +
  11-field detection rows written to disk, parsed by parse_rec/extract_BB/
  gen_det_result — vs eval/voc.py on the same data in memory.
* freihand/utils/eval_util.py EvalUtil (PCK/AUC) vs eval/hpe.py EvalUtil.
* fcos_utils/utils.py generalized_box_iou_loss vs ops/boxes.giou_loss.
* fcos_utils/anchor_utils.py AnchorGenerator vs ops/anchors
  fcos_anchor_pyramid (torchvision ImageList stubbed — never used beyond
  carrying tensors/sizes).

The reference sources predate numpy 2 (np.bool / np.int / np.trapz);
tests restore those aliases around the import. Everything skips when
/root/reference is absent.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = os.environ.get("HANDNET_REFERENCE", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mount not available")


@pytest.fixture(autouse=True)
def _numpy1_aliases(monkeypatch):
    # the only numpy-1 alias the reference uses that numpy 2 dropped
    # (np.bool/np.trapz still exist in numpy 2.0; replacing them would
    # break numpy.testing internals)
    if not hasattr(np, "int"):
        monkeypatch.setattr(np, "int", int, raising=False)
    if not hasattr(np, "trapz"):
        monkeypatch.setattr(np, "trapz", np.trapezoid, raising=False)


def _load(name: str, relpath: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# VOC AP + hand-constrained AP through the reference's file protocol


def _xml_for(objects) -> str:
    parts = ["<annotation>"]
    for o in objects:
        ob = o.objectbbox
        def tag(k, v):
            return f"<{k}>{v}</{k}>"
        parts.append(
            "<object>" + tag("name", o.name) + tag("pose", "Unspecified")
            + tag("truncated", 0) + tag("difficult", int(o.difficult))
            + "<bndbox>" + tag("xmin", int(o.bbox[0]))
            + tag("ymin", int(o.bbox[1])) + tag("xmax", int(o.bbox[2]))
            + tag("ymax", int(o.bbox[3])) + "</bndbox>"
            + tag("contactstate", o.handstate) + tag("handside", o.handside)
            + tag("objxmin", "None" if ob is None else float(ob[0]))
            + tag("objymin", "None" if ob is None else float(ob[1]))
            + tag("objxmax", "None" if ob is None else float(ob[2]))
            + tag("objymax", "None" if ob is None else float(ob[3]))
            + "</object>")
    parts.append("</annotation>")
    return "".join(parts)


def _random_scenario(rng, n_images=12):
    """Annotations + hand/object detections exercising every constraint
    branch: some difficult GTs, in-contact and contact-free hands, missing
    and present objectbboxes, correct and wrong state/side predictions."""
    from handnet_tpu.eval.voc import Detection, GTObject

    annotations = {}
    hand_dets, obj_dets = [], []
    scores = rng.permutation(10000)[:4 * n_images * 4].astype(float) / 10000.0
    s = iter(scores)

    def box(max_xy=400.0):
        x1, y1 = rng.uniform(0, max_xy, 2)
        w, h = rng.uniform(20, 120, 2)
        return np.array([int(x1), int(y1), int(x1 + w), int(y1 + h)], float)

    for i in range(n_images):
        image_id = f"im{i:03d}"
        objs = []
        for _ in range(rng.integers(1, 3)):
            ob = box()
            objs.append(GTObject("targetobject", ob))
            if rng.uniform() < 0.8:   # detection near this object
                jitter = rng.uniform(-12, 12, 4)
                obj_dets.append(Detection(image_id, next(s), ob + jitter))
        # per-image homogeneous GT linking: the reference's
        # np.array([objectbbox...]) (voc_eval.py:330) predates numpy 2's
        # ragged-array ban, so a mixed None/list image would crash ITS code
        link_mode = bool(rng.uniform() < 0.6)
        for _ in range(rng.integers(1, 3)):
            hb = box()
            state = int(rng.integers(1, 5)) if link_mode else 0
            side = int(rng.integers(0, 2))
            link = objs[0].bbox if link_mode else None
            objs.append(GTObject("hand", hb,
                                 difficult=bool(rng.uniform() < 0.15),
                                 handstate=state, handside=side,
                                 objectbbox=link))
            if rng.uniform() < 0.9:   # a matching-ish hand detection
                jitter = rng.uniform(-15, 15, 4)
                det_state = state if rng.uniform() < 0.7 else int(
                    rng.integers(0, 5))
                det_side = side if rng.uniform() < 0.7 else 1 - side
                vec = np.array([rng.uniform(0, 0.02),
                                *rng.normal(size=2)])
                hand_dets.append(Detection(image_id, next(s), hb + jitter,
                                           det_state, vec, det_side))
        if rng.uniform() < 0.3:       # an unmatched false positive
            hand_dets.append(Detection(image_id, next(s), box(),
                                       int(rng.integers(0, 5)),
                                       np.array([0.01, 1.0, 0.0]),
                                       int(rng.integers(0, 2))))
        annotations[image_id] = objs
    return annotations, hand_dets, obj_dets


def _write_reference_files(tmp_path, annotations, hand_dets, obj_dets):
    anno_dir = tmp_path / "Annotations"
    anno_dir.mkdir()
    for image_id, objs in annotations.items():
        (anno_dir / f"{image_id}.xml").write_text(_xml_for(objs))
    (tmp_path / "imageset.txt").write_text(
        "\n".join(annotations.keys()) + "\n")
    # 11-field hand rows / 6-field object rows (trainval_net_fcos.py:137-158
    # format; extract_BB contract at voc_eval.py:618-637)
    with open(tmp_path / "det_hand.txt", "w") as f:
        for d in hand_dets:
            f.write(f"{d.image_id} {d.score} "
                    + " ".join(str(float(v)) for v in d.bbox)
                    + f" {d.handstate} "
                    + " ".join(str(float(v)) for v in d.vector)
                    + f" {d.handside}\n")
    with open(tmp_path / "det_targetobject.txt", "w") as f:
        for d in obj_dets:
            f.write(f"{d.image_id} {d.score} "
                    + " ".join(str(float(v)) for v in d.bbox) + "\n")
    cache = tmp_path / "cache"
    cache.mkdir()
    return (str(tmp_path / "det_{}.txt"),
            str(anno_dir / "{}.xml"),
            str(tmp_path / "imageset.txt"),
            str(cache))


def test_voc_eval_matches_reference(tmp_path, rng):
    ref = _load("ref_voc_eval", "lib/datasets/voc_eval.py")
    from handnet_tpu.eval.voc import voc_eval

    annotations, hand_dets, obj_dets = _random_scenario(rng)
    detpath, annopath, imageset, cache = _write_reference_files(
        tmp_path, annotations, hand_dets, obj_dets)

    for cls, dets in (("hand", hand_dets), ("targetobject", obj_dets)):
        ref_rec, ref_prec, ref_ap = ref.voc_eval(
            detpath, annopath, imageset, cls, cache, ovthresh=0.5)
        my_rec, my_prec, my_ap = voc_eval(dets, annotations, cls, 0.5)
        np.testing.assert_allclose(my_rec, ref_rec, atol=1e-12, err_msg=cls)
        np.testing.assert_allclose(my_prec, ref_prec, atol=1e-12,
                                   err_msg=cls)
        np.testing.assert_allclose(my_ap, ref_ap, atol=1e-12, err_msg=cls)


def test_voc_eval_hand_constraints_match_reference(tmp_path, rng):
    ref = _load("ref_voc_eval", "lib/datasets/voc_eval.py")
    from handnet_tpu.eval.voc import voc_eval_hand

    annotations, hand_dets, obj_dets = _random_scenario(rng, n_images=16)
    detpath, annopath, imageset, cache = _write_reference_files(
        tmp_path, annotations, hand_dets, obj_dets)

    aps = {}
    for constraint in ("", "handstate", "handside", "objectbbox", "all"):
        _, _, ref_ap = ref.voc_eval_hand(
            detpath, annopath, imageset, "hand", cache, ovthresh=0.5,
            constraint=constraint)
        _, _, my_ap = voc_eval_hand(hand_dets, obj_dets, annotations,
                                    "hand", 0.5, constraint=constraint)
        np.testing.assert_allclose(my_ap, ref_ap, atol=1e-12,
                                   err_msg=constraint or "none")
        aps[constraint] = ref_ap
    # the scenario must actually discriminate between constraints
    assert len({round(v, 6) for v in aps.values()}) >= 3


# ---------------------------------------------------------------------------
# freihand EvalUtil (PCK / AUC)


def test_evalutil_matches_reference(rng):
    ref = _load("ref_eval_util", "dex-ycb-toolkit/freihand/utils/eval_util.py")
    from handnet_tpu.eval.hpe import EvalUtil

    gt = rng.normal(size=(40, 21, 3)) * 20
    pred = gt + rng.normal(size=(40, 21, 3)) * 8
    vis = rng.uniform(size=(40, 21)) < 0.9

    theirs = ref.EvalUtil(num_kp=21)
    mine = EvalUtil(num_kp=21)
    for i in range(40):
        theirs.feed(gt[i], vis[i].astype(float), pred[i])
        mine.feed(gt[i], vis[i].astype(float), pred[i])

    t_mean, t_median, t_auc, t_curve, t_thresh = theirs.get_measures(
        0.0, 50.0, 100)
    m_mean, m_median, m_auc, m_curve, m_thresh = mine.get_measures(
        0.0, 50.0, 100)
    np.testing.assert_allclose(m_mean, t_mean, rtol=1e-12)
    np.testing.assert_allclose(m_median, t_median, rtol=1e-12)
    np.testing.assert_allclose(m_auc, t_auc, rtol=1e-12)
    np.testing.assert_allclose(m_curve, np.asarray(t_curve), rtol=1e-12)
    np.testing.assert_allclose(m_thresh, t_thresh, rtol=1e-12)


# ---------------------------------------------------------------------------
# GIoU loss


def test_giou_loss_matches_reference(rng):
    ref = _load("ref_fcos_giou", "fcos_utils/utils.py")
    import jax.numpy as jnp

    from handnet_tpu.ops.boxes import giou_loss

    x1y1 = rng.uniform(0, 200, size=(64, 2)).astype(np.float32)
    wh = rng.uniform(5, 100, size=(64, 2)).astype(np.float32)
    a = np.concatenate([x1y1, x1y1 + wh], 1)
    x1y1b = rng.uniform(0, 200, size=(64, 2)).astype(np.float32)
    whb = rng.uniform(5, 100, size=(64, 2)).astype(np.float32)
    b = np.concatenate([x1y1b, x1y1b + whb], 1)

    with torch.no_grad():
        want = ref.generalized_box_iou_loss(
            torch.as_tensor(a), torch.as_tensor(b), reduction="none").numpy()
    got = np.asarray(giou_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# FCOS AnchorGenerator (single size/aspect per level, fcos.py:488-493)


def test_fcos_anchors_match_reference(rng):
    # anchor_utils needs torchvision's ImageList only as a (tensors,
    # image_sizes) carrier — stub it
    il_mod = types.ModuleType("torchvision.models.detection.image_list")

    class ImageList:
        def __init__(self, tensors, image_sizes):
            self.tensors = tensors
            self.image_sizes = image_sizes

    il_mod.ImageList = ImageList
    tv = sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    models = types.ModuleType("torchvision.models")
    detection = types.ModuleType("torchvision.models.detection")
    sys.modules.setdefault("torchvision.models", models)
    sys.modules.setdefault("torchvision.models.detection", detection)
    sys.modules["torchvision.models.detection.image_list"] = il_mod
    ref = _load("ref_anchor_utils", "fcos_utils/anchor_utils.py")

    from handnet_tpu.ops.anchors import fcos_anchor_pyramid

    h, w = 64, 96
    strides = (8, 16, 32)
    gen = ref.AnchorGenerator(sizes=((8,), (16,), (32,)),
                              aspect_ratios=((1.0,),) * 3)
    feats = [torch.zeros(1, 256, h // s, w // s) for s in strides]
    images = ImageList(torch.zeros(1, 3, h, w), [(h, w)])
    with torch.no_grad():
        ref_anchors = gen(images, feats)[0].numpy()

    mine, _, _ = fcos_anchor_pyramid(h, w, strides)
    np.testing.assert_allclose(mine, ref_anchors, atol=1e-5)
