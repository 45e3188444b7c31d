"""A2J training CLI: DexYCB -> sharded train loop -> checkpoints -> HPE eval.

Replaces trainval_net_a2j.py (LightningCLI + config/a2j.yaml) with an
explicit loop over the same recipe (AdamW 3.5e-4 / wd 1e-4 / StepLR 0.2
every 10 / bs 64 / 45 epochs). Data parallel over all local devices via the
mesh; metrics go to the Monitor txt/html logs (no wandb dependency).

Usage:
  python -m handnet_tpu.apps.train_a2j --data-dir $DEX_YCB_DIR
      [--epochs 45] [--batch 64] [--output models/a2j_tpu]
      [--synthetic N]   # N synthetic sequences instead of real data
"""

from __future__ import annotations

import argparse
import os
import time

import jax

from handnet_tpu import runtime as _runtime
_runtime.setup()
import jax.numpy as jnp
import numpy as np

from handnet_tpu.config import A2JConfig, TrainConfig
from handnet_tpu.data.a2j_data import A2JDataSource, A2JSampleConfig
from handnet_tpu.data.dexycb import DexYCBDataset, refine_indices
from handnet_tpu.data.loader import PrefetchLoader
from handnet_tpu.eval.hpe import HPEEvaluator, format_result_line
from handnet_tpu.ops.geometry import convert_joints
from handnet_tpu.parallel.mesh import create_mesh, shard_batch
from handnet_tpu.train.checkpoints import CheckpointManager
from handnet_tpu.train.trainer import A2JTrainer
from handnet_tpu.utils.meters import AverageMeters
from handnet_tpu.utils.monitoring import Monitor


def build_sources(args):
    if args.synthetic:
        import tempfile

        from handnet_tpu.data.synthetic import make_synthetic_dexycb

        root = args.data_dir or tempfile.mkdtemp(prefix="synth_dexycb_")
        if not os.path.exists(os.path.join(root, "calibration")):
            make_synthetic_dexycb(root, n_sequences=args.synthetic,
                                  n_frames=4)
        train_ds = DexYCBDataset("s0", "train", data_dir=root)
        test_ds = DexYCBDataset("s0", "train", data_dir=root)
    else:
        train_ds = DexYCBDataset("s0", "train", data_dir=args.data_dir)
        test_ds = DexYCBDataset("s0", "test", data_dir=args.data_dir)
    cache = os.path.join(args.output, "cache")
    train_idx = refine_indices(
        train_ds, cache_path=os.path.join(cache, "refined_train_idx.pkl"))
    test_idx = refine_indices(
        test_ds, cache_path=os.path.join(cache, "refined_test_idx.pkl"))
    cfg = A2JSampleConfig(crop_w=args.crop, crop_h=args.crop)
    rgbd = getattr(args, "rgbd", False)
    return (A2JDataSource(train_ds, train_idx, augment=True, cfg=cfg,
                          with_color=rgbd),
            A2JDataSource(test_ds, test_idx, augment=False, cfg=cfg,
                          with_color=rgbd),
            test_ds)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", default=os.environ.get("DEX_YCB_DIR"))
    parser.add_argument("--output", default="models/a2j_tpu")
    parser.add_argument("--epochs", type=int, default=45)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--lr", type=float, default=3.5e-4)
    parser.add_argument("--crop", type=int, default=176)
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="use N synthetic sequences (smoke runs)")
    parser.add_argument("--eval-every", type=int, default=5)
    parser.add_argument("--rgbd", action="store_true",
                        help="train the 4-channel RGBD variant "
                             "(a2j/a2j.py:216 is_RGBD)")
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("--no-bf16", dest="bf16", action="store_false")
    args = parser.parse_args(argv)

    os.makedirs(args.output, exist_ok=True)
    train_src, test_src, test_ds = build_sources(args)
    print(f"train samples: {len(train_src)}  test samples: {len(test_src)}")

    mesh = create_mesh()
    n_dev = mesh.devices.size
    batch = max(args.batch // n_dev * n_dev, n_dev)
    loader = PrefetchLoader(train_src, batch, shuffle=True,
                            num_workers=args.workers,
                            shard_id=jax.process_index(),
                            num_shards=jax.process_count())
    steps_per_epoch = max(len(loader), 1)

    model_cfg = A2JConfig(crop_h=args.crop, crop_w=args.crop,
                          in_channels=4 if args.rgbd else 1)
    train_cfg = TrainConfig(batch_size=batch, lr=args.lr, bf16=args.bf16,
                            epochs=args.epochs)
    trainer = A2JTrainer(model_cfg, train_cfg, mesh=mesh,
                         steps_per_epoch=steps_per_epoch)
    state = trainer.init_state(jax.random.PRNGKey(train_cfg.seed))

    ckpt = CheckpointManager(os.path.join(args.output, "checkpoints"))
    monitor = Monitor(args.output)
    start_epoch = 0
    if args.resume and ckpt.latest_epoch() is not None:
        state = ckpt.restore(state)
        start_epoch = ckpt.latest_epoch() + 1
        print(f"resumed from epoch {ckpt.latest_epoch()}")

    for epoch in range(start_epoch, args.epochs):
        loader.set_epoch(epoch)
        meters = AverageMeters()
        t0 = time.time()
        for batch_np in loader:
            image_key = "rgbd" if args.rgbd else "depth"
            dev_batch = shard_batch(mesh, {
                "image": jnp.asarray(batch_np[image_key]),
                "jt_uvd": jnp.asarray(batch_np["jt_uvd"]),
            })
            state, metrics = trainer.train_step(state, dev_batch)
            meters.update({k: float(v) for k, v in metrics.items()})
        dt = time.time() - t0
        avg = meters.averages()
        print(f"epoch {epoch}: loss={avg.get('total_loss', 0):.4f} "
              f"({dt:.1f}s, {steps_per_epoch * batch / max(dt, 1e-9):.0f} "
              f"samples/s)")
        monitor.log_train(epoch, avg)
        ckpt.save(epoch, state)

        if (epoch + 1) % args.eval_every == 0 or epoch == args.epochs - 1:
            evaluate(trainer, state, test_src, test_ds, args, epoch, monitor)

    monitor.metrics.save_metrics()
    monitor.metrics.plot_metrics()
    # flat npz export alongside orbax — what a2j_infer/the pipeline load
    from handnet_tpu.train.checkpoints import save_params_npz

    save_params_npz(os.path.join(args.output, "params.npz"),
                    jax.device_get(state.params))
    save_params_npz(os.path.join(args.output, "batch_stats.npz"),
                    jax.device_get(state.batch_stats))
    print(f"done; logs + params.npz in {args.output}")


def evaluate(trainer, state, test_src, test_ds, args, epoch, monitor):
    """Test sweep -> result txt (a2j/a2j.py:354-362 format) -> HPE metrics."""
    from handnet_tpu.data.dexycb import hpe_ground_truth

    loader = PrefetchLoader(test_src, trainer.train_cfg.batch_size,
                            shuffle=False, num_workers=args.workers,
                            drop_last=False)
    res_lines = []
    rmses = []
    image_key = "rgbd" if getattr(args, "rgbd", False) else "depth"
    for batch_np in loader:
        n = batch_np[image_key].shape[0]
        pred, rmse = trainer.eval_step(state, {
            "image": jnp.asarray(batch_np[image_key]),
            "jt_uvd": jnp.asarray(batch_np["jt_uvd"]),
        })
        rmses.append(float(rmse))
        xyz = convert_joints(pred, jnp.asarray(batch_np["box"]),
                             jnp.asarray(batch_np["paras"]),
                             args.crop, args.crop)
        xyz = np.asarray(xyz)
        for i in range(n):
            res_lines.append(format_result_line(
                int(batch_np["dexycb_id"][i, 0]), xyz[i]))

    metrics_dir = os.path.join(args.output, "a2j_test_metrics")
    os.makedirs(metrics_dir, exist_ok=True)
    res_file = os.path.join(metrics_dir, f"s0_test_{epoch}.txt")
    with open(res_file, "w") as f:
        f.write("\n".join(res_lines) + "\n")

    gt = hpe_ground_truth(test_ds)
    evaluator = HPEEvaluator(gt)
    results = evaluator.evaluate(epoch, res_file)
    print(evaluator.report(results))
    evaluator.save_epoch_metrics(os.path.join(args.output, "dexycb_metrics"))
    # per-epoch PCK-curve HTML (reference hpe_eval.py:240-250)
    evaluator.save_pck_curves(
        os.path.join(args.output, "dexycb_metrics"), epoch)
    monitor.log_val(epoch, {
        "rmse": float(np.mean(rmses)),
        "mpjpe_ab": results["absolute"]["mpjpe"],
        "mpjpe_pa": results["procrustes"]["mpjpe"],
        "auc_ab": results["absolute"]["auc"],
    })


if __name__ == "__main__":
    main()
