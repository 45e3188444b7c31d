"""Grasp coverage/precision metric tests."""

import numpy as np

from handnet_tpu.eval.grasp import (GraspEvaluator, collision_free_mask,
                                    grasp_coverage, quat_multiply,
                                    quat_rotation_angle)


def quat_from_axis_angle(axis, angle):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    return np.concatenate([[np.cos(angle / 2)], np.sin(angle / 2) * axis])


def grasp(t, q):
    return np.concatenate([t, q])


def test_quat_rotation_angle():
    q = quat_from_axis_angle([0, 0, 1], np.deg2rad(40))
    np.testing.assert_allclose(np.degrees(quat_rotation_angle(q)), 40,
                               atol=1e-6)


def test_quat_multiply_identity():
    q = quat_from_axis_angle([1, 2, 3], 0.7)
    ident = np.array([1.0, 0, 0, 0])
    np.testing.assert_allclose(quat_multiply(q, ident), q, atol=1e-12)


def test_coverage_exact_match():
    q = quat_from_axis_angle([0, 0, 1], 0.3)
    gt = np.stack([grasp([0, 0, 0.5], q)])
    pred = np.stack([grasp([0, 0, 0.5], q)])
    n, idx = grasp_coverage(pred, gt, radius=0.01, angle=np.deg2rad(15))
    assert n == 1 and list(idx) == [0]


def test_coverage_radius_and_angle_gates():
    q = quat_from_axis_angle([0, 0, 1], 0.0)
    gt = np.stack([grasp([0, 0, 0.5], q)])
    # too far
    pred_far = np.stack([grasp([0.05, 0, 0.5], q)])
    assert grasp_coverage(pred_far, gt, 0.01, np.deg2rad(15))[0] == 0
    # close but rotated 40deg
    q40 = quat_from_axis_angle([0, 1, 0], np.deg2rad(40))
    pred_rot = np.stack([grasp([0.005, 0, 0.5], q40)])
    assert grasp_coverage(pred_rot, gt, 0.01, np.deg2rad(15))[0] == 0
    assert grasp_coverage(pred_rot, gt, 0.01, np.deg2rad(45))[0] == 1


def test_evaluator_sweep():
    q = quat_from_axis_angle([0, 0, 1], 0.0)
    gt = np.stack([grasp([0, 0, 0.5], q), grasp([0.2, 0, 0.5], q)])
    pred = np.stack([grasp([0.001, 0, 0.5], q)])  # covers only the first
    ev = GraspEvaluator()
    res = ev.evaluate_scene(pred, gt)
    agg = ev.aggregate([res])
    assert agg["coverage_r0.01_a15"] == 0.5
    assert agg["precision_r0.01_a15"] == 1.0


def test_collision_filter():
    tf = np.eye(4)[None]
    gripper = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.1]])
    hand_far = np.array([[1.0, 1.0, 1.0]])
    hand_near = np.array([[0.0, 0.0, 0.095]])
    assert collision_free_mask(tf, gripper, hand_far, 0.01)[0]
    assert not collision_free_mask(tf, gripper, hand_near, 0.01)[0]
