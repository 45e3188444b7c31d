"""HPE evaluator tests: EvalUtil measures vs an independent per-sample oracle,
result-file format round-trip (the 64-field contract of hpe_eval.py:123-135),
and alignment behavior of the three metric variants."""

import numpy as np
import pytest

from handnet_tpu.eval.hpe import (EvalUtil, HPEEvaluator, format_result_line,
                                  parse_result_file)


def test_evalutil_perfect_prediction():
    util = EvalUtil()
    gt = np.random.default_rng(0).normal(size=(10, 21, 3)) * 30
    util.feed_batch(gt, gt)
    mean, median, auc, pck, thresh = util.get_measures()
    assert mean == 0.0 and median == 0.0
    # PCK is 1 everywhere -> AUC 1
    np.testing.assert_allclose(auc, 1.0)
    np.testing.assert_allclose(pck, 1.0)


def test_evalutil_known_distance():
    util = EvalUtil(num_kp=2)
    gt = np.zeros((5, 2, 3))
    pred = gt.copy()
    pred[..., 0] = 25.0  # every keypoint off by exactly 25mm
    util.feed_batch(gt, pred)
    mean, median, auc, pck, thresh = util.get_measures(0, 50, 100)
    assert mean == 25.0
    # PCK = 0 below 25, 1 at/above -> AUC ~ 0.5 (exact: fraction of
    # thresholds >= 25 = 50/99... trapz handles the step)
    frac = np.trapezoid((thresh >= 25).astype(float), thresh) / 50.0
    np.testing.assert_allclose(auc, frac)


def test_evalutil_matches_per_sample_feed(rng):
    gt = rng.normal(size=(20, 21, 3)) * 20
    pred = gt + rng.normal(size=(20, 21, 3)) * 5
    u1 = EvalUtil()
    u1.feed_batch(gt, pred)
    u2 = EvalUtil()
    for i in range(20):
        u2.feed(gt[i], np.ones(21), pred[i])
    m1 = u1.get_measures()
    m2 = u2.get_measures()
    np.testing.assert_allclose(m1[0], m2[0])
    np.testing.assert_allclose(m1[2], m2[2])


def test_result_file_roundtrip(tmp_path, rng):
    joints = rng.normal(size=(3, 21, 3)) * 100
    path = tmp_path / "s0_test_0.txt"
    with open(path, "w") as f:
        for i in range(3):
            print(format_result_line(i * 7, joints[i]), file=f)
    parsed = parse_result_file(str(path))
    assert set(parsed) == {0, 7, 14}
    np.testing.assert_allclose(parsed[7], joints[1], rtol=1e-12)


def test_result_file_rejects_bad_lines(tmp_path):
    path = tmp_path / "bad.txt"
    path.write_text("1,2,3\n")
    with pytest.raises(ValueError):
        parse_result_file(str(path))


def test_hpe_evaluator_three_alignments(rng):
    ids = list(range(8))
    gt = {i: rng.normal(size=(21, 3)) * 40 for i in ids}

    # prediction = gt shifted by a constant -> rr and pa perfect, ab not
    shift = np.array([10.0, -5.0, 2.0])
    res = {i: gt[i] + shift for i in ids}

    ev = HPEEvaluator(gt)
    out = ev.evaluate_dict(0, res)
    np.testing.assert_allclose(out["absolute"]["mpjpe"],
                               np.linalg.norm(shift), rtol=1e-6)
    np.testing.assert_allclose(out["root-relative"]["mpjpe"], 0.0, atol=1e-9)
    np.testing.assert_allclose(out["procrustes"]["mpjpe"], 0.0, atol=1e-6)
    # AUC ~1 (the t=0 PCK bin loses ~1e-15 rounding, exactly as the reference
    # evaluator would)
    assert out["root-relative"]["auc"] > 0.998

    report = ev.report(out)
    assert "absolute" in report and "MPJPE" in report


def test_hpe_evaluator_skips_missing_ids(rng):
    gt = {i: rng.normal(size=(21, 3)) for i in range(5)}
    res = {0: gt[0], 2: gt[2]}  # only 2 of 5 present
    out = HPEEvaluator(gt).evaluate_dict(0, res)
    assert out["absolute"]["mpjpe"] == 0.0


def test_pck_curve_html(tmp_path, rng):
    """save_pck_curves emits the reference's per-epoch curve artifact
    (hpe_eval.py:240-250) as well-formed HTML with three SVG curves."""
    import xml.etree.ElementTree as ET

    gt = {i: rng.normal(size=(21, 3)) * 10 for i in range(4)}
    res = {i: gt[i] + rng.normal(size=(21, 3)) for i in range(4)}
    ev = HPEEvaluator(gt)
    assert ev.save_pck_curves(str(tmp_path), 3) is None  # not evaluated yet
    ev.evaluate_dict(3, res)
    path = ev.save_pck_curves(str(tmp_path), 3)
    assert path is not None and path.endswith("hpe_curve_3.html")
    text = open(path).read()
    assert text.count("<svg") == 3
    for title in ("absolute", "root-relative", "Procrustes"):
        assert title in text
    # each SVG parses as XML and carries a non-empty polyline
    for chunk in text.split("<svg")[1:]:
        svg = ET.fromstring("<svg" + chunk.split("</svg>")[0] + "</svg>")
        pts = [el for el in svg.iter() if el.tag.endswith("polyline")]
        assert pts and len(pts[0].attrib["points"].split()) > 10
