"""Tests: pose2mesh losses, color jitter, offset field round-trip,
rotation ops."""

import jax.numpy as jnp
import numpy as np

from handnet_tpu.data.imgtrans import (adjust_brightness, adjust_contrast,
                                       adjust_hue, adjust_saturation,
                                       color_jitter)
from handnet_tpu.ops.offset_field import joint2offset, offset2joint_softmax
from handnet_tpu.ops.rotation import (batch_rodrigues, rot6d_to_rotmat)
from handnet_tpu.train.pose2mesh_loss import (coord_l1, edge_length_loss,
                                              laplacian_loss,
                                              normal_vector_loss,
                                              pose2mesh_losses,
                                              uniform_laplacian)


def test_rodrigues_known_rotation():
    # pi/2 about z
    aa = jnp.asarray([[0.0, 0.0, np.pi / 2]])
    r = np.asarray(batch_rodrigues(aa))[0]
    expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(r, expect, atol=1e-5)


def test_rodrigues_orthonormal(rng):
    aa = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    r = np.asarray(batch_rodrigues(aa))
    eye = np.einsum("bij,bkj->bik", r, r)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_rot6d_orthonormal(rng):
    x = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
    r = np.asarray(rot6d_to_rotmat(x))
    eye = np.einsum("bij,bkj->bik", r, r)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)


def test_pose2mesh_losses_zero_when_equal(rng):
    faces = np.stack([np.arange(10), np.arange(1, 11), np.arange(2, 12)], 1)
    mesh = jnp.asarray(rng.normal(size=(2, 12, 3)).astype(np.float32))
    pose = jnp.asarray(rng.normal(size=(2, 21, 3)).astype(np.float32))
    losses = pose2mesh_losses(mesh, mesh, pose, pose, faces=faces)
    assert float(losses["mesh_coord"]) == 0.0
    assert float(losses["pose_coord"]) == 0.0
    assert float(losses["edge"]) == 0.0
    # normal loss is |cos(edge, gt_normal)| = 0 for identical meshes
    assert float(losses["normal"]) < 1e-5


def test_edge_and_coord_losses_positive(rng):
    faces = np.stack([np.arange(10), np.arange(1, 11), np.arange(2, 12)], 1)
    a = jnp.asarray(rng.normal(size=(1, 12, 3)).astype(np.float32))
    b = a * 1.5
    assert float(edge_length_loss(a, b, faces)) > 0
    assert float(coord_l1(a, b)) > 0
    assert float(normal_vector_loss(a, b, faces)) >= 0


def test_laplacian_loss_flat_for_linear(rng):
    # a straight line strip has zero uniform-Laplacian residual inside
    faces = np.stack([np.arange(8), np.arange(1, 9), np.arange(2, 10)], 1)
    lap = uniform_laplacian(faces, 10)
    # linear coordinates: interior rows average to the point itself
    pts = jnp.asarray(np.linspace(0, 1, 10)[None, :, None]
                      * np.ones((1, 10, 3), np.float32))
    val = float(laplacian_loss(pts, jnp.asarray(lap)))
    assert val < 0.2  # boundary rows contribute a little


def test_color_jitter_ops(rng):
    img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    assert adjust_brightness(img, 1.0).max() <= 1.0
    np.testing.assert_allclose(adjust_brightness(img, 1.0), img)
    np.testing.assert_allclose(adjust_contrast(img, 1.0), img, atol=1e-6)
    np.testing.assert_allclose(adjust_saturation(img, 1.0), img, atol=1e-6)
    np.testing.assert_allclose(adjust_hue(img, 0.0), img, atol=1e-4)
    out = color_jitter(img, 0.4, 0.4, 0.4, 0.1,
                       rng=np.random.default_rng(0))
    assert out.shape == img.shape
    assert out.min() >= 0 and out.max() <= 1


def test_offset_field_roundtrip(rng):
    """encode -> decode recovers the joints (within field resolution)."""
    jt = rng.uniform(-0.5, 0.5, size=(2, 4, 3)).astype(np.float32)
    img = np.full((2, 1, 32, 32), 0.0, np.float32)  # all pixels valid
    field = joint2offset(jnp.asarray(jt), jnp.asarray(img), 0.8, 32)
    assert field.shape == (2, 16, 32, 32)
    back = np.asarray(offset2joint_softmax(field, jnp.asarray(img), 0.8))
    np.testing.assert_allclose(back, jt, atol=0.1)


def test_runtime_multihost_hooks(monkeypatch):
    """setup(distributed=...) gates jax.distributed.initialize on coordinator
    env; process_shard maps process_index/count to the PrefetchLoader shard
    contract (the reference's DistributedSampler, utils/utils.py:53)."""
    import jax

    from handnet_tpu import runtime

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **k: calls.append(k))
    monkeypatch.setattr(runtime, "_distributed_done", False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("HANDNET_DISTRIBUTED", raising=False)

    runtime.setup()                      # no coordinator -> single process
    assert calls == []
    runtime.setup(distributed=False)     # forced off
    assert calls == []
    monkeypatch.setenv("HANDNET_DISTRIBUTED", "1")
    runtime.setup()                      # coordinator env -> initialize
    assert calls == [{}]
    runtime.setup()                      # idempotent: every entry point
    assert calls == [{}]                 # calls setup() at import

    # the explicit triple is forwarded (jax env-reads only
    # JAX_COORDINATOR_ADDRESS on its own)
    monkeypatch.setattr(runtime, "_distributed_done", False)
    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("PROCESS_ID", "3")
    monkeypatch.setenv("NUM_PROCESSES", "8")
    runtime.setup()
    assert calls[-1] == {"coordinator_address": "10.0.0.1:1234",
                         "process_id": 3, "num_processes": 8}

    sid, n = runtime.process_shard()
    assert (sid, n) == (0, 1)            # single-process in tests


def test_runtime_platform_override(monkeypatch):
    """HANDNET_PLATFORM forces jax_platforms through setup() — the uniform
    CPU kill-switch for training tools while the TPU tunnel is down (plain
    JAX_PLATFORMS env is ignored: sitecustomize pins the CONFIG value)."""
    import jax

    from handnet_tpu import runtime

    updates = []
    monkeypatch.setattr(jax.config, "update",
                        lambda k, v: updates.append((k, v)))
    monkeypatch.setenv("HANDNET_PLATFORM", "cpu")
    runtime.setup(distributed=False)
    assert ("jax_platforms", "cpu") in updates

    updates.clear()
    monkeypatch.delenv("HANDNET_PLATFORM")
    runtime.setup(distributed=False)
    assert not any(k == "jax_platforms" for k, _ in updates)


def test_prefetch_loader_shard_math():
    """Every shard gets the same ceil(n/num_shards) count (pjit needs equal
    per-host batches) and the union covers the dataset."""
    import numpy as np

    from handnet_tpu.data.loader import PrefetchLoader

    class _DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.asarray([i])}

    seen = []
    per_shard_counts = []
    for sid in range(4):
        loader = PrefetchLoader(_DS(), batch_size=1, shuffle=False,
                                shard_id=sid, num_shards=4)
        items = [int(b["x"][0, 0]) for b in loader]
        per_shard_counts.append(len(items))
        seen.extend(items)
    assert len(set(per_shard_counts)) == 1          # equal per-host work
    assert set(seen) >= set(range(10))              # full coverage (pad wraps)
