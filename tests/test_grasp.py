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
    ev = GraspEvaluator(radius=(0.01, 0.02),
                        angles=(np.deg2rad(15), np.deg2rad(30)))
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


# --- full scene workflow (grasp_eval.py:359-649) ----------------------------

from handnet_tpu.eval.grasp import (GraspScene, hand_pc_from_mask,  # noqa: E402
                                    mats_to_tq, quaternion_from_matrix)


def rot_z(a):
    c, s = np.cos(a), np.sin(a)
    m = np.eye(4)
    m[:2, :2] = [[c, -s], [s, c]]
    return m


def box_pc(half=0.03, n=6):
    """Surface point cloud of an axis-aligned cube (model frame)."""
    lin = np.linspace(-half, half, n)
    g1, g2 = np.meshgrid(lin, lin)
    faces = []
    for axis in range(3):
        for sign in (-half, half):
            pts = np.zeros((n * n, 3))
            pts[:, axis] = sign
            pts[:, (axis + 1) % 3] = g1.ravel()
            pts[:, (axis + 2) % 3] = g2.ravel()
            faces.append(pts)
    return np.concatenate(faces)


def grasp_above(dist=0.12, angle=0.0):
    """Gripper posed `dist` above the object origin, fingers pointing down."""
    m = rot_z(angle)
    m[2, 3] = dist
    return m


def test_quaternion_from_matrix_roundtrip():
    for a in (0.0, 0.4, 2.0, np.pi - 0.1):
        m = rot_z(a)
        q = quaternion_from_matrix(m)
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-12)
        np.testing.assert_allclose(quat_rotation_angle(q), abs(a), atol=1e-9)


def test_hand_pc_from_mask_deprojects_and_filters():
    depth = np.zeros((8, 10), np.float32)
    mask = np.zeros((8, 10), bool)
    for x in (4, 5, 6):                 # 3 inliers around the center
        depth[4, x] = 0.5
        mask[4, x] = True
    depth[0, 0] = 5.0   # outlier, masked in but >0.2m from median
    mask[0, 0] = True
    mask[1, 1] = True   # masked but zero depth -> dropped
    pc = hand_pc_from_mask(mask, depth, fx=100, fy=100, ppx=5, ppy=4)
    assert pc.shape == (3, 3)
    np.testing.assert_allclose(pc[:, 2], 0.5, atol=1e-9)
    np.testing.assert_allclose(sorted(pc[:, 0]), [-0.005, 0.0, 0.005],
                               atol=1e-9)


def test_full_scene_perfect_prediction():
    cands = np.stack([grasp_above(0.12, a)
                      for a in np.linspace(0, np.pi, 8, endpoint=False)])
    pose = np.eye(4)
    pose[:3, 3] = [0.0, 0.0, 0.6]
    scene = GraspScene(candidate_grasps=cands, obj_pose_gt=pose,
                       obj_pc=box_pc(), obj_pose_pred=pose.copy())
    ev = GraspEvaluator()
    out = ev.evaluate_full_scene(scene)
    r, a = ev.radius[0], ev.angles[0]
    # identical poses: every GT grasp covered, every pred covers
    assert out["coverage"][r][a][0.0] == 1.0
    assert out["precision"][r][a][0.0] == 1.0


def test_full_scene_undetected_scores_zero():
    cands = np.stack([grasp_above()])
    scene = GraspScene(candidate_grasps=cands, obj_pose_gt=np.eye(4),
                       obj_pc=box_pc(), obj_pose_pred=None)
    ev = GraspEvaluator()
    out = ev.evaluate_full_scene(scene)
    assert all(v == 0.0
               for rr in out["coverage"].values()
               for aa in rr.values() for v in aa.values())


def test_full_scene_hand_distance_thresholds_prune_grasps():
    """A predicted hand point cloud close to one grasp removes it at large
    dist thresholds but keeps it at small ones."""
    cands = np.stack([grasp_above(0.12, 0.0), grasp_above(0.12, np.pi / 2)])
    pose = np.eye(4)
    pose[:3, 3] = [0, 0, 0.6]
    # hand point ~5mm from grasp 0's +x finger (x=0.04, z in [0.12, 0.22]);
    # grasp 1's fingers sit at y=+-0.04 -> ~60mm away from it
    hand = (pose[:3, 3] + np.array([0.045, 0.0, 0.17]))[None]
    hand_verts_gt = pose[:3, 3][None] + np.array([[0.0, 0.2, 0.0]])  # far
    scene = GraspScene(candidate_grasps=cands, obj_pose_gt=pose,
                       obj_pc=box_pc(), obj_pose_pred=pose.copy(),
                       hand_verts_gt=hand_verts_gt, hand_pc_pred=hand)
    ev = GraspEvaluator(dist_thresholds=(0.0, 0.03))
    out = ev.evaluate_full_scene(scene)
    r, a = ev.radius[0], ev.angles[0]
    assert out["coverage"][r][a][0.0] == 1.0      # both grasps kept
    assert out["coverage"][r][a][0.03] == 0.5     # near-hand grasp pruned


def test_full_scene_gt_collision_filter():
    """A grasp candidate inside the GT hand mesh is excluded from the GT set
    and marked colliding in the pred set."""
    cands = np.stack([grasp_above(0.12, 0.0), grasp_above(0.30, 0.0)])
    pose = np.eye(4)
    pose[:3, 3] = [0, 0, 0.6]
    # GT hand occupying the region of candidate 0's gripper
    hand_verts = pose[:3, 3] + np.array([[0.0, 0.0, 0.17]])
    scene = GraspScene(candidate_grasps=cands, obj_pose_gt=pose,
                       obj_pc=box_pc(), obj_pose_pred=pose.copy(),
                       hand_verts_gt=hand_verts)
    ev = GraspEvaluator(collision_eps=0.06)
    out = ev.evaluate_full_scene(scene)
    r, a = ev.radius[0], ev.angles[0]
    # GT set = only the far grasp; pred keeps both vs pred obj, but the near
    # one collides with the GT hand -> coverage 1 (far covered by far),
    # precision 1/2 (reference divides by all kept, grasp_eval.py:608)
    assert out["coverage"][r][a][0.0] == 1.0
    assert out["precision"][r][a][0.0] == 0.5


def test_scene_table_shape():
    cands = np.stack([grasp_above()])
    pose = np.eye(4); pose[:3, 3] = [0, 0, 0.6]
    scenes = [GraspScene(candidate_grasps=cands, obj_pose_gt=pose,
                         obj_pc=box_pc(), obj_pose_pred=pose.copy()),
              GraspScene(candidate_grasps=cands, obj_pose_gt=pose,
                         obj_pc=box_pc(), obj_pose_pred=None)]
    ev = GraspEvaluator()
    rows = ev.evaluate_scenes(scenes)
    assert len(rows) == len(ev.radius) * len(ev.angles) * len(ev.dist_thresholds)
    # detected scene perfect, undetected zero -> mean 0.5
    assert rows[0][3] == 0.5 and rows[0][4] == 0.5
    table = ev.format_table(rows)
    assert "coverage" in table and table.count("\n") == len(rows) + 1


def test_panda_gripper_pc_geometry():
    """Surface sample lies on the primitive boxes and spans the envelope
    (80mm opening, 54mm fingers)."""
    from handnet_tpu.eval.grasp import panda_gripper_pc

    pc = panda_gripper_pc(256)
    assert pc.shape == (256, 3)
    assert abs(pc[:, 0].max() - 0.04) < 1e-6 and abs(pc[:, 0].min() + 0.04) < 1e-6
    assert pc[:, 2].max() <= 0.054 + 1e-9 and pc[:, 2].min() >= -0.02 - 1e-9
    # deterministic
    np.testing.assert_array_equal(pc, panda_gripper_pc(256))


def test_solid_penetration_sphere_oracle():
    """Closed-form penetration depth: sphere touching a finger face."""
    from handnet_tpu.eval.grasp import solid_penetration_sphere

    tf = np.eye(4)
    # sphere centered between the fingers at finger midheight: nearest solid
    # is the palm-bar top face (z=0, 27mm below), nearer than the finger
    # inner faces (|x|=0.030)
    center = np.array([0.0, 0.0, 0.027])
    assert abs(solid_penetration_sphere(tf, center, 0.027) - 0.0) < 1e-9
    assert abs(solid_penetration_sphere(tf, center, 0.032) - 0.005) < 1e-9
    # directly between the finger inner faces, above the palm: fingers win
    mid = np.array([0.0, 0.0, 0.100])
    d_finger = np.sqrt(0.030 ** 2 + (0.100 - 0.054) ** 2)  # edge distance
    assert abs(solid_penetration_sphere(tf, mid, d_finger) - 0.0) < 1e-9
    # far away: deeply negative (clearance)
    far = np.array([0.0, 0.0, 0.50])
    assert solid_penetration_sphere(tf, far, 0.03) < -0.4


def test_collision_calibration_catches_penetrations():
    """The committed defaults (panda_gripper_pc(256), eps=5mm) must flag
    EVERY pose whose exact solid penetration is >=1mm, and never flag
    clearance >eps+2mm — the measured bound from
    tools/calibrate_grasp_collision.py (0% miss / 0% FA over 1500 trials at
    both scene densities), spot-verified here on 300 fresh-seed trials at
    the sparser (hand, 778-pt) density."""
    from handnet_tpu.eval.grasp import (_min_dist_to, panda_gripper_pc,
                                        solid_penetration_sphere)

    r = 0.03
    n_scene = 778
    i = np.arange(n_scene) + 0.5
    phi = np.arccos(1 - 2 * i / n_scene)
    theta = np.pi * (1 + 5 ** 0.5) * i
    scene = r * np.stack([np.sin(phi) * np.cos(theta),
                          np.sin(phi) * np.sin(theta), np.cos(phi)], axis=1)

    gpc = panda_gripper_pc(256)
    eps = 0.005
    rng = np.random.default_rng(99)
    n_pen = n_clear = 0
    for _ in range(300):
        q, rr = np.linalg.qr(rng.normal(size=(3, 3)))
        q *= np.sign(np.diag(rr))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        tf = np.eye(4)
        tf[:3, :3] = q
        tf[:3, 3] = rng.uniform(-0.08, 0.08, size=3)
        depth = solid_penetration_sphere(tf, np.zeros(3), r)
        flagged = _min_dist_to(gpc @ tf[:3, :3].T + tf[:3, 3], scene) <= eps
        if depth >= 0.001:
            n_pen += 1
            assert flagged, f"missed {depth * 1000:.1f}mm penetration"
        elif depth <= -(eps + 0.002):
            n_clear += 1
            assert not flagged, f"false alarm at {-depth * 1000:.1f}mm clear"
    assert n_pen > 20 and n_clear > 20  # both regimes actually exercised
