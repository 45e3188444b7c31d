"""Software depth rasterizer + VSD metric tests.

Oracle strategy: planes have analytic per-pixel ray depth, so the
perspective-correct interpolation is checked exactly; VSD is checked via
its limit cases (identical pose -> 0, disjoint pose -> 1) and monotonicity.
"""

import numpy as np

from handnet_tpu.eval.bop_pose import depth_to_dist, vsd
from handnet_tpu.utils.raster import render_depth, render_mesh_overlay

K = np.array([[300.0, 0, 64], [0, 300.0, 48], [0, 0, 1]])
H, W = 96, 128


def square_mesh(z=500.0, half=100.0, tilt=0.0):
    """Two triangles spanning x,y in [-half, half] at depth z + tilt*x."""
    v = np.array([[-half, -half, z - tilt * half],
                  [half, -half, z + tilt * half],
                  [half, half, z + tilt * half],
                  [-half, half, z - tilt * half]])
    f = np.array([[0, 1, 2], [0, 2, 3]])
    return v, f


def test_flat_square_constant_depth():
    v, f = square_mesh(z=500.0)
    depth = render_depth(v, f, K, H, W)
    inside = depth > 0
    assert inside.sum() > 100
    np.testing.assert_allclose(depth[inside], 500.0, rtol=1e-6)
    # projected extent: x in [-100, 100] at z 500 -> u in [cx-60, cx+60]
    cols = np.nonzero(inside.any(axis=0))[0]
    assert abs(cols.min() - (64 - 60)) <= 1 and abs(cols.max() - (64 + 60)) <= 1


def test_tilted_plane_matches_analytic_ray_depth():
    # plane z = z0 + k*x; along pixel ray x = (u-cx)/fx * z:
    # z = z0 / (1 - k*(u-cx)/fx)
    z0, k = 500.0, 0.4
    v, f = square_mesh(z=z0, tilt=k)
    depth = render_depth(v, f, K, H, W)
    ys, xs = np.nonzero(depth > 0)
    analytic = z0 / (1.0 - k * (xs - K[0, 2]) / K[0, 0])
    np.testing.assert_allclose(depth[ys, xs], analytic, rtol=1e-4)


def test_zbuffer_occlusion():
    v1, f1 = square_mesh(z=400.0, half=50.0)
    v2, f2 = square_mesh(z=800.0, half=120.0)
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f2 + 4])
    depth = render_depth(v, f, K, H, W)
    np.testing.assert_allclose(depth[48, 64], 400.0)  # near plane wins
    # far plane visible outside the near square's projection
    far = depth[(depth > 0) & (np.abs(depth - 400.0) > 1.0)]
    assert far.size > 0
    np.testing.assert_allclose(far, 800.0, rtol=1e-9)


def test_behind_camera_dropped():
    v, f = square_mesh(z=-500.0)
    depth = render_depth(v, f, K, H, W)
    assert (depth == 0).all()


def test_depth_to_dist():
    depth = np.zeros((H, W))
    depth[48, 64] = 500.0   # principal point: dist == depth
    depth[0, 0] = 500.0
    dist = depth_to_dist(depth, K)
    np.testing.assert_allclose(dist[48, 64], 500.0)
    expect = 500.0 * np.sqrt(((0 - 64) / 300) ** 2 + ((0 - 48) / 300) ** 2 + 1)
    np.testing.assert_allclose(dist[0, 0], expect)
    assert dist[1, 1] == 0.0


def test_vsd_limits_and_monotonicity():
    v, f = square_mesh(z=0.0, half=60.0)   # model frame around origin
    R = np.eye(3)
    t_gt = np.array([0.0, 0.0, 500.0])
    diam = float(np.linalg.norm(v.max(0) - v.min(0)))
    # scene depth = the GT render itself
    depth_test = render_depth(v + t_gt, f, K, H, W)
    taus = [0.05, 0.2, 0.5]

    errs = vsd(R, t_gt, R, t_gt, depth_test, K, v, f, diam, taus=taus)
    assert np.allclose(errs, 0.0)

    # completely disjoint estimate -> error 1 at every tau
    t_far = np.array([5000.0, 0.0, 500.0])
    errs = vsd(R, t_far, R, t_gt, depth_test, K, v, f, diam, taus=taus)
    assert np.allclose(errs, 1.0)

    # increasing depth offset -> non-decreasing error at fixed tau
    prev = -1.0
    for dz in (0.0, 20.0, 60.0, 200.0):
        e = vsd(R, t_gt + [0, 0, dz], R, t_gt, depth_test, K, v, f, diam,
                taus=[0.1])[0]
        assert e >= prev - 1e-9
        prev = e


def test_vsd_matches_brute_force_point_depth():
    """step-cost VSD against an independent per-pixel computation built from
    point-projected depth (no rasterizer shared code paths beyond render)."""
    v, f = square_mesh(z=0.0, half=60.0)
    R = np.eye(3)
    t_gt = np.array([0.0, 0.0, 500.0])
    t_est = np.array([0.0, 0.0, 530.0])
    diam = 100.0
    depth_test = render_depth(v + t_gt, f, K, H, W)
    tau, delta = 0.25, 15.0

    got = vsd(R, t_est, R, t_gt, depth_test, K, v, f, diam,
              delta=delta, taus=[tau])[0]

    # brute force: planes at constant z -> analytic dist images
    d_gt = depth_to_dist(render_depth(v + t_gt, f, K, H, W), K)
    d_est = depth_to_dist(render_depth(v + t_est, f, K, H, W), K)
    d_tst = depth_to_dist(depth_test, K)
    vis_gt = (d_gt > 0) & (((d_gt - d_tst) <= delta) | (d_tst == 0))
    vis_est = (d_est > 0) & (((d_est - d_tst) <= delta) | (d_tst == 0))
    vis_est |= vis_gt & (d_est > 0)
    inter, union = vis_gt & vis_est, vis_gt | vis_est
    dists = np.abs(d_gt[inter] - d_est[inter]) / diam
    expect = ((dists >= tau).sum() + union.sum() - inter.sum()) / union.sum()
    np.testing.assert_allclose(got, expect, rtol=1e-9)


def test_mesh_overlay_blends_and_preserves_dtype():
    frame = np.full((H, W, 3), 30, np.uint8)
    v, f = square_mesh(z=500.0, half=50.0)
    out = render_mesh_overlay(frame, v, f, K)
    assert out.dtype == np.uint8 and out.shape == frame.shape
    assert (out[48, 64] != frame[48, 64]).any()    # mesh painted at center
    assert (out[0, 0] == frame[0, 0]).all()        # background untouched
