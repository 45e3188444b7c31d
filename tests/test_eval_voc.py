"""VOC AP + hand-constrained AP tests against hand-built scenarios with known
precision/recall outcomes (reference semantics: lib/datasets/voc_eval.py)."""

import numpy as np

from handnet_tpu.eval.voc import (Detection, GTObject,
                                  associate_hands_to_objects,
                                  evaluate_detections_100doh, voc_ap, voc_eval,
                                  voc_eval_hand)


def box(x1, y1, x2, y2):
    return np.array([x1, y1, x2, y2], float)


def test_voc_ap_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert voc_ap(rec, prec) == 1.0


def test_voc_ap_11point():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 0.5])
    ap = voc_ap(rec, prec, use_07_metric=True)
    # 11-point: thresholds 0..1; p=1 for t<=0.5 (6 pts), p=0.5 above (5 pts)
    np.testing.assert_allclose(ap, (6 * 1.0 + 5 * 0.5) / 11)


def _simple_annotations():
    return {
        "im0": [GTObject("hand", box(10, 10, 50, 50), handstate=1, handside=0,
                         objectbbox=box(60, 10, 100, 50)),
                GTObject("targetobject", box(60, 10, 100, 50))],
        "im1": [GTObject("hand", box(20, 20, 80, 80), handstate=0, handside=1)],
    }


def test_voc_eval_perfect_detections():
    annos = _simple_annotations()
    dets = [Detection("im0", 0.9, box(10, 10, 50, 50)),
            Detection("im1", 0.8, box(20, 20, 80, 80))]
    rec, prec, ap = voc_eval(dets, annos, "hand")
    assert ap == 1.0


def test_voc_eval_false_positive_lowers_ap():
    annos = _simple_annotations()
    dets = [Detection("im0", 0.95, box(200, 200, 240, 240)),  # FP first
            Detection("im0", 0.9, box(10, 10, 50, 50)),
            Detection("im1", 0.8, box(20, 20, 80, 80))]
    _, _, ap = voc_eval(dets, annos, "hand")
    assert ap < 1.0


def test_voc_eval_duplicate_detection_is_fp():
    annos = _simple_annotations()
    dets = [Detection("im0", 0.9, box(10, 10, 50, 50)),
            Detection("im0", 0.85, box(11, 11, 51, 51)),  # duplicate
            Detection("im1", 0.8, box(20, 20, 80, 80))]
    rec, prec, ap = voc_eval(dets, annos, "hand")
    assert rec[-1] == 1.0
    assert prec[-1] < 1.0


def test_hand_constraint_handside():
    annos = _simple_annotations()
    dets_right = [Detection("im0", 0.9, box(10, 10, 50, 50), handside=0),
                  Detection("im1", 0.8, box(20, 20, 80, 80), handside=1)]
    _, _, ap_ok = voc_eval_hand(dets_right, [], annos,
                                constraint="handside")
    dets_wrong = [Detection("im0", 0.9, box(10, 10, 50, 50), handside=1),
                  Detection("im1", 0.8, box(20, 20, 80, 80), handside=0)]
    _, _, ap_bad = voc_eval_hand(dets_wrong, [], annos,
                                 constraint="handside")
    assert ap_ok == 1.0
    assert ap_bad == 0.0


def test_hand_object_association():
    # in-contact hand with a vector pointing right at the object center
    hand = Detection("im0", 0.9, box(10, 10, 50, 50), handstate=1,
                     vector=np.array([0.004, 0.0, 1.0]))  # mag*1e4*dy = 40 px
    objs = [Detection("im0", 0.7, box(60, 10, 100, 50)),
            Detection("im0", 0.6, box(10, 200, 50, 240))]
    linked = associate_hands_to_objects([hand], objs)
    np.testing.assert_allclose(linked[0].objectbbox, box(60, 10, 100, 50))

    # not-in-contact hand gets no object
    hand2 = Detection("im0", 0.9, box(10, 10, 50, 50), handstate=0)
    linked2 = associate_hands_to_objects([hand2], objs)
    assert linked2[0].objectbbox is None


def test_objectbbox_constraint():
    annos = _simple_annotations()
    hand = Detection("im0", 0.9, box(10, 10, 50, 50), handstate=1,
                     vector=np.array([0.004, 0.0, 1.0]))
    hand_im1 = Detection("im1", 0.8, box(20, 20, 80, 80), handstate=0)
    objs = [Detection("im0", 0.7, box(60, 10, 100, 50))]
    _, _, ap = voc_eval_hand([hand, hand_im1], objs, annos,
                             constraint="objectbbox")
    assert ap == 1.0  # im0 links correct object; im1 both-None passes

    # object detection far from GT object -> constraint fails for im0
    objs_bad = [Detection("im0", 0.7, box(200, 200, 240, 240))]
    hand_bad = Detection("im0", 0.9, box(10, 10, 50, 50), handstate=1,
                         vector=np.array([0.02, 0.0, 1.0]))
    _, _, ap_bad = voc_eval_hand([hand_bad, hand_im1], objs_bad, annos,
                                 constraint="objectbbox")
    assert ap_bad < 1.0


def test_full_100doh_sweep():
    annos = _simple_annotations()
    hands = [Detection("im0", 0.9, box(10, 10, 50, 50), handstate=1,
                       handside=0, vector=np.array([0.004, 0.0, 1.0])),
             Detection("im1", 0.8, box(20, 20, 80, 80), handstate=0,
                       handside=1)]
    objs = [Detection("im0", 0.7, box(60, 10, 100, 50))]
    out = evaluate_detections_100doh(hands, objs, annos)
    assert out["ap_hand"] == 1.0
    assert out["ap_targetobject"] == 1.0
    assert out["ap_hand_all"] == 1.0
