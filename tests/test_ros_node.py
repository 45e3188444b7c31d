"""ROS adapter tests — transport-agnostic core with a fake transport.

The actual rclpy wiring (apps/ros_node.py run_rclpy) needs a ROS 2 install;
everything testable without one is tested here: the approximate-time pairing
(ros_demo.py:204-207 semantics), CameraInfo intrinsics extraction
(:201-202), depth decode (:224-236), and the full frames-in/results-out loop
against a real PipelineServer.
"""

import queue

import jax.numpy as jnp
import numpy as np
import pytest

from handnet_tpu.apps.ros_node import (ApproximateTimeSynchronizer,
                                       HandNetRosNode, decode_depth,
                                       intrinsics_to_paras)


def test_module_importable_without_ros():
    import sys

    import handnet_tpu.apps.ros_node  # noqa: F401 — import is the test

    assert "rclpy" not in sys.modules


def test_sync_pairs_within_slop():
    pairs = []
    sync = ApproximateTimeSynchronizer(
        lambda s, a, b: pairs.append((s, a, b)), slop=0.1)
    assert not sync.add(0, 1.00, "rgb0")
    assert sync.add(1, 1.05, "depth0")       # within slop -> fires
    assert pairs == [(1.00, "rgb0", "depth0")]

    assert not sync.add(1, 2.0, "depth1")
    assert not sync.add(0, 2.5, "rgb1")      # 0.5s apart -> no pair
    assert sync.add(1, 2.55, "depth2")       # pairs with rgb1
    assert pairs[-1] == (2.5, "rgb1", "depth2")


def test_sync_queue_bounded_keeps_newest():
    pairs = []
    sync = ApproximateTimeSynchronizer(
        lambda s, a, b: pairs.append((a, b)), slop=0.05, queue_size=1)
    sync.add(0, 1.0, "old")
    sync.add(0, 9.0, "new")                  # evicts "old" (maxlen=1)
    assert sync.add(1, 9.01, "d")
    assert pairs == [("new", "d")]


def test_intrinsics_to_paras():
    k = [600.0, 0, 320.0, 0, 590.0, 241.0, 0, 0, 1]
    np.testing.assert_array_equal(intrinsics_to_paras(k),
                                  [600.0, 590.0, 320.0, 241.0])


def test_decode_depth():
    mm = np.array([[1500, 0]], np.uint16)
    np.testing.assert_allclose(decode_depth(mm, "16UC1"), [[1.5, 0.0]])
    m = np.array([[0.7]], np.float32)
    np.testing.assert_allclose(decode_depth(m, "32FC1"), [[0.7]])
    with pytest.raises(ValueError):
        decode_depth(m, "bgr8")


def test_node_end_to_end_with_fake_transport():
    """Synced RGB+depth pairs flow through a real PipelineServer and come
    back as published hand_pose payloads with stamps and XYZ."""
    from handnet_tpu.apps.serve import PipelineServer
    from handnet_tpu.config import (A2JConfig, FCOSConfig, HandNetConfig,
                                    PipelineConfig)

    cfg = HandNetConfig(
        a2j=A2JConfig(crop_h=48, crop_w=48),
        fcos=FCOSConfig(image_h=64, image_w=96, max_detections=8,
                        num_classes=2, ext=False),
        pipeline=PipelineConfig(crop_size=48))
    hw = (60, 80)
    server = PipelineServer(cfg, batch_size=2, frame_hw=hw,
                            dtype=jnp.float32).start()
    published = []
    node = HandNetRosNode(server, lambda topic, p: published.append((topic, p)))
    node.set_camera_info([600, 0, 40, 0, 600, 30, 0, 0, 1])

    rng = np.random.default_rng(0)
    try:
        for i in range(4):
            t = 10.0 + i
            node.on_rgb(t, rng.uniform(size=hw + (3,)).astype(np.float32))
            node.on_depth(
                t + 0.02,
                (rng.uniform(300, 1000, size=hw)).astype(np.uint16),
                "16UC1")
        got = 0
        import time
        deadline = time.time() + 60
        while got < 4 and time.time() < deadline:
            got += node.drain(timeout=0.5)
    finally:
        server.stop()

    assert got == 4
    topics = {t for t, _ in published}
    assert topics == {"hand_pose"}
    stamps = sorted(p["stamp"] for _, p in published)
    assert stamps == [10.0, 11.0, 12.0, 13.0]
    for _, p in published:
        assert p["joints_uvd"].shape == (21, 3)
        assert p["joints_xyz"].shape == (21, 3)
        assert np.isfinite(p["joints_xyz"]).all()


def test_unsupported_depth_encoding_skipped():
    """Bad encodings are dropped without pairing (ros_demo.py:232-236)."""
    server_calls = []

    class _FakeServer:
        def submit(self, *a):
            server_calls.append(a)

    node = HandNetRosNode(_FakeServer(), lambda t, p: None)
    node.on_rgb(1.0, np.zeros((4, 4, 3), np.float32))
    node.on_depth(1.01, np.zeros((4, 4)), "bgr8")   # dropped
    assert server_calls == []
    node.on_depth(1.02, np.zeros((4, 4), np.float32), "32FC1")
    assert len(server_calls) == 1
