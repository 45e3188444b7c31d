"""Graph coarsening + Pose2Mesh tests.

The binary-tree permutation has a published oracle (the spectral-graph-convnet
algorithm's own worked example) — we assert exact parity. Chebyshev conv is
checked against a manual numpy recurrence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from handnet_tpu.models.pose2mesh import (MeshNet, Pose2Mesh, PoseNet,
                                          cheby_conv,
                                          normalize_joints_for_pose2mesh)
from handnet_tpu.ops import graph as G

SKELETON = ((0, 1), (0, 5), (0, 9), (0, 13), (0, 17), (1, 2), (2, 3), (3, 4),
            (5, 6), (6, 7), (7, 8), (9, 10), (10, 11), (11, 12), (13, 14),
            (14, 15), (15, 16), (17, 18), (18, 19), (19, 20))


def random_mesh(rng, n_verts=80, n_faces=200):
    faces = rng.integers(0, n_verts, size=(n_faces, 3))
    # ensure non-degenerate triangles and full vertex coverage
    faces[:, 1] = (faces[:, 0] + 1) % n_verts
    faces[:, 2] = (faces[:, 0] + 2) % n_verts
    faces[:n_verts, 0] = np.arange(n_verts)
    faces[:n_verts, 1] = (np.arange(n_verts) + 1) % n_verts
    faces[:n_verts, 2] = (np.arange(n_verts) + 2) % n_verts
    return faces


def test_binary_tree_perm_matches_published_example():
    """Exact oracle from the spectral_graph_convnets reference
    (coarsening.py:269-271 doctest)."""
    parents = [np.array([4, 1, 1, 2, 2, 3, 0, 0, 3]), np.array([2, 1, 0, 1, 0])]
    perms = G.binary_tree_perms(parents)
    assert [list(p) for p in perms] == [
        [3, 4, 0, 9, 1, 2, 5, 8, 6, 7, 10, 11], [2, 4, 1, 3, 0, 5], [0, 1, 2]]


def test_mesh_adjacency_symmetric_binary(rng):
    faces = random_mesh(rng)
    adj = G.mesh_adjacency(faces, 80)
    assert (adj != adj.T).nnz == 0
    assert adj.diagonal().sum() == 0
    assert set(np.unique(adj.data)) == {1.0}


def test_joint_adjacency_has_skeleton_and_selfloops():
    adj = G.joint_adjacency(21, SKELETON)
    assert adj[0, 1] == 1 and adj[1, 0] == 1
    assert np.all(np.diag(adj) == 1)


def test_laplacian_eigen_range(rng):
    faces = random_mesh(rng)
    adj = G.mesh_adjacency(faces, 80)
    L = G.normalized_laplacian(adj)
    lm = G.lmax(L)
    assert 0 < lm <= 2.0 + 1e-6
    Lr = G.rescale_laplacian(L, lm)
    eigs = np.linalg.eigvalsh(np.asarray(Lr.todense()))
    assert eigs.min() >= -1.0 - 1e-5 and eigs.max() <= 1.0 + 1e-5


def test_pyramid_binary_tree_sizes(rng):
    faces = random_mesh(rng)
    pyr = G.build_graph_pyramid(faces, 21, SKELETON, levels=6)
    sizes = pyr.mesh_sizes
    # mesh levels halve exactly (binary tree with fake nodes); last is the
    # 21-joint graph
    assert sizes[-1] == 21
    for a, b in zip(sizes[:-2], sizes[1:-1]):
        assert a == 2 * b
    # perm_reverse maps original verts into the padded ordering
    assert pyr.perm_reverse.shape[0] == sizes[0]
    recovered = pyr.perm[pyr.perm_reverse[:80]]
    np.testing.assert_array_equal(recovered, np.arange(80))


def test_cheby_conv_matches_numpy_oracle(rng):
    b, v, fin, fout, k = 2, 12, 4, 6, 3
    x = rng.normal(size=(b, v, fin)).astype(np.float32)
    L = rng.normal(size=(v, v)).astype(np.float32)
    L = (L + L.T) / 2
    w = rng.normal(size=(fin * k, fout)).astype(np.float32)
    bias = rng.normal(size=(fout,)).astype(np.float32)

    ours = np.asarray(cheby_conv(jnp.asarray(x), jnp.asarray(L),
                                 jnp.asarray(w), jnp.asarray(bias), k))

    # manual recurrence, reference layout [B,V,Fin,K] -> [B,V,Fin*K]
    t0 = x
    t1 = np.einsum("vu,buf->bvf", L, x)
    t2 = 2 * np.einsum("vu,buf->bvf", L, t1) - t0
    stacked = np.stack([t0, t1, t2], axis=-1).reshape(b, v, fin * k)
    oracle = np.einsum("bvi,io->bvo", stacked, w) + bias
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def p2m_setup():
    rng = np.random.default_rng(0)
    faces = random_mesh(rng)
    pyr = G.build_graph_pyramid(faces, 21, SKELETON, levels=6)
    model = Pose2Mesh(pyramid=pyr)
    pose2d = jnp.asarray(rng.normal(size=(2, 21, 2)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pose2d, train=False)
    return model, variables, pyr, pose2d


def test_pose2mesh_forward_shapes(p2m_setup):
    model, variables, pyr, pose2d = p2m_setup
    mesh, pose3d = model.apply(variables, pose2d, train=False)
    assert pose3d.shape == (2, 21, 3)
    assert mesh.shape == (2, pyr.mesh_sizes[0], 3)
    assert np.isfinite(np.asarray(mesh)).all()
    # original-vertex recovery (ros_demo.py:162)
    verts = np.asarray(mesh)[:, pyr.perm_reverse[:80]]
    assert verts.shape == (2, 80, 3)


def test_pose2mesh_grads_flow(p2m_setup, rng):
    model, variables, pyr, pose2d = p2m_setup
    target = jnp.asarray(rng.normal(size=(2, pyr.mesh_sizes[0], 3))
                         .astype(np.float32))

    def loss_fn(params):
        v = dict(variables, params=params)
        mesh, pose3d = model.apply(
            v, pose2d, train=True, mutable=False,
            rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.mean((mesh - target) ** 2) + jnp.mean(pose3d ** 2)

    # batch_stats updates disabled for simplicity: eval-mode BN in loss
    def loss_eval(params):
        v = dict(variables, params=params)
        mesh, pose3d = model.apply(v, pose2d, train=False)
        return jnp.mean((mesh - target) ** 2) + jnp.mean(pose3d ** 2)

    loss, grads = jax.value_and_grad(loss_eval)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert sum(float(jnp.abs(g).sum()) for g in leaves) > 0


def test_normalize_joints_zero_mean_unit_std(rng):
    j = rng.uniform(50, 400, size=(21, 2))
    out = normalize_joints_for_pose2mesh(j)
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=0), 1.0, atol=1e-4)
