"""100DOH VOC data layer tests on a synthetic VOC tree: xml parsing with hand
attrs, roidb shapes, detection-file round trip, end-to-end AP sweep."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from handnet_tpu.data.voc100doh import (CLASSES, VOC100DOH, VOCDetectSource,
                                        decoded_to_detections,
                                        parse_annotation, read_detection_file,
                                        write_detection_file)
from handnet_tpu.eval.voc import Detection, evaluate_detections_100doh


def write_xml(path, objects):
    root = ET.Element("annotation")
    for o in objects:
        obj = ET.SubElement(root, "object")
        ET.SubElement(obj, "name").text = o["name"]
        bb = ET.SubElement(obj, "bndbox")
        for k, v in zip(("xmin", "ymin", "xmax", "ymax"), o["bbox"]):
            ET.SubElement(bb, k).text = str(v)
        for k in ("difficult", "contactstate", "handside", "magnitude",
                  "unitdx", "unitdy", "objxmin", "objymin", "objxmax",
                  "objymax"):
            ET.SubElement(obj, k).text = str(o.get(k, "None"))
    ET.ElementTree(root).write(path)


@pytest.fixture(scope="module")
def voc_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("voc"))
    devkit = os.path.join(root, "VOC2007")
    for sub in ("Annotations", "ImageSets/Main", "JPEGImages"):
        os.makedirs(os.path.join(devkit, sub), exist_ok=True)

    import cv2

    images = ["img000", "img001"]
    with open(os.path.join(devkit, "ImageSets", "Main", "trainval.txt"),
              "w") as f:
        f.write("\n".join(images) + "\n")

    write_xml(os.path.join(devkit, "Annotations", "img000.xml"), [
        {"name": "hand", "bbox": (11, 11, 51, 51), "difficult": 0,
         "contactstate": 3, "handside": 1, "magnitude": 100, "unitdx": 0.6,
         "unitdy": 0.8, "objxmin": 60, "objymin": 10, "objxmax": 100,
         "objymax": 50},
        {"name": "targetobject", "bbox": (61, 11, 101, 51), "difficult": 0},
    ])
    write_xml(os.path.join(devkit, "Annotations", "img001.xml"), [
        {"name": "hand", "bbox": (21, 21, 81, 81), "difficult": 0,
         "contactstate": 0, "handside": 0},
    ])
    rng = np.random.default_rng(0)
    for im in images:
        cv2.imwrite(os.path.join(devkit, "JPEGImages", f"{im}.jpg"),
                    rng.integers(0, 255, size=(120, 160, 3)).astype(np.uint8))
    return root


def test_parse_annotation_hand_attrs(voc_tree):
    ds = VOC100DOH(voc_tree)
    objs = parse_annotation(ds.annotation_path("img000"))
    hand = [o for o in objs if o["name"] == "hand"][0]
    # boxes become 0-based (pascal_voc.py:246-250)
    np.testing.assert_allclose(hand["bbox"], [10, 10, 50, 50])
    assert hand["contactstate"] == 3
    assert hand["handside"] == 1
    np.testing.assert_allclose(hand["magnitude"], 0.1)  # x0.001
    np.testing.assert_allclose(hand["objectbbox"], [60, 10, 100, 50])


def test_roidb_fixed_shapes(voc_tree):
    ds = VOC100DOH(voc_tree)
    roidb = ds.roidb(max_boxes=4)
    assert len(roidb) == 2
    rec = roidb[0]
    assert rec["boxes"].shape == (4, 4)
    assert rec["valid"].sum() == 2
    assert set(rec["labels"][rec["valid"]]) == {1, 2}  # object + hand
    hand_row = int(np.flatnonzero(rec["labels"] == 2)[0])
    np.testing.assert_allclose(rec["box_info"][hand_row],
                               [3, 1, 0.1, 0.6, 0.8], atol=1e-6)


def test_detect_source(voc_tree):
    src = VOCDetectSource(VOC100DOH(voc_tree), max_boxes=4)
    item = src[0]
    assert item["image"].shape == (120, 160, 3)
    assert item["target_boxes"].shape == (4, 4)


def test_detection_file_roundtrip(tmp_path):
    dets = [Detection("img000", 0.9, np.array([10.0, 10, 50, 50]),
                      handstate=3, vector=np.array([0.1, 0.6, 0.8]),
                      handside=1)]
    path = str(tmp_path / "comp4_det_test_hand.txt")
    write_detection_file(path, dets)
    back = read_detection_file(path)
    assert len(back) == 1
    d = back[0]
    assert d.image_id == "img000"
    np.testing.assert_allclose(d.bbox, dets[0].bbox)
    assert d.handstate == 3 and d.handside == 1
    np.testing.assert_allclose(d.vector, dets[0].vector, atol=1e-5)


def test_end_to_end_ap_sweep(voc_tree):
    ds = VOC100DOH(voc_tree)
    annos = ds.annotations()
    hands = [
        Detection("img000", 0.9, np.array([10.0, 10, 50, 50]), handstate=3,
                  vector=np.array([0.004, 0.0, 1.0]), handside=1),
        Detection("img001", 0.85, np.array([20.0, 20, 80, 80]), handstate=0,
                  handside=0),
    ]
    objects = [Detection("img000", 0.8, np.array([60.0, 10, 100, 50]))]
    out = evaluate_detections_100doh(hands, objects, annos)
    assert out["ap_hand"] == 1.0
    assert out["ap_targetobject"] == 1.0
    assert out["ap_hand_handside"] == 1.0
    assert out["ap_hand_all"] == 1.0


def test_decoded_to_detections_packing():
    det = {
        "boxes": np.array([[[10, 10, 50, 50], [60, 10, 100, 50],
                            [0, 0, 0, 0]]], np.float32),
        "scores": np.array([[0.9, 0.8, 0.0]], np.float32),
        "labels": np.array([[2, 1, 0]]),
        "valid": np.array([[True, True, False]]),
        "sides": np.array([[1, 0, 0]]),
        "contacts": np.array([[3, 0, 0]]),
        "dxdymags": np.zeros((1, 3, 3), np.float32),
    }
    hands, objects = decoded_to_detections(det, ["img000"])
    assert len(hands) == 1 and len(objects) == 1
    assert hands[0].handside == 1 and hands[0].handstate == 3
