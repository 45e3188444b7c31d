"""FCOS detector training CLI.

Replaces trainval_net_fcos.py:26-265 (hand-written AMP loop, warmup +
MultiStepLR, NaN guard, per-epoch checkpoints, VOC eval + FPS) with the
explicit TPU loop. Data: DexYCB detection targets (hand + objects) or the
synthetic tree; the 100DOH/VOC path plugs in through data/voc100doh.py.

Usage:
  python -m handnet_tpu.apps.train_fcos --data-dir $DEX_YCB_DIR
      [--synthetic N] [--epochs 45] [--batch 8] [--image-h 800 --image-w 1088]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import jax

from handnet_tpu import runtime as _runtime
_runtime.setup()
import jax.numpy as jnp
import numpy as np

from handnet_tpu.config import FCOSConfig, TrainConfig
from handnet_tpu.data.detect_data import DetectDataSource
from handnet_tpu.data.dexycb import DexYCBDataset, refine_indices
from handnet_tpu.data.loader import PrefetchLoader
from handnet_tpu.models.fcos import preprocess
from handnet_tpu.parallel.mesh import create_mesh, shard_batch
from handnet_tpu.train.checkpoints import CheckpointManager
from handnet_tpu.train.trainer import FCOSTrainer
from handnet_tpu.utils.meters import AverageMeters
from handnet_tpu.utils.monitoring import Monitor


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", default=os.environ.get("DEX_YCB_DIR"))
    parser.add_argument("--output", default="models/fcos_tpu")
    parser.add_argument("--epochs", type=int, default=45)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1.25e-3)
    parser.add_argument("--image-h", type=int, default=800)
    parser.add_argument("--image-w", type=int, default=1088)
    parser.add_argument("--num-classes", type=int, default=23,
                        help="22 ycb+hand categories + background-ish slot")
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--voc-root", default=None,
                        help="train on 100DOH VOC (sets num_classes=3)")
    parser.add_argument("--voc-image-set", default="trainval")
    parser.add_argument("--net", default="fcos", choices=["fcos", "rcnn"],
                        help="detector family, like the reference's --net "
                             "flag (trainval_net_fcos.py:184-187): 'rcnn' "
                             "trains the Faster R-CNN alternative")
    parser.add_argument("--num-proposals", type=int, default=128,
                        help="rcnn only: fixed per-image proposal budget")
    parser.add_argument("--backbone-norm", default="batch",
                        choices=["batch", "frozen", "group"],
                        help="'frozen' only when starting from converted "
                             "pretrained weights (the reference recipe); "
                             "from-scratch training needs 'batch'")
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("--no-bf16", dest="bf16", action="store_false")
    args = parser.parse_args(argv)

    os.makedirs(args.output, exist_ok=True)
    if args.voc_root:
        from handnet_tpu.data.voc100doh import VOC100DOH, VOCDetectSource

        args.num_classes = 3  # background / targetobject / hand
        src = VOCDetectSource(VOC100DOH(args.voc_root, args.voc_image_set),
                              target_size=(args.image_h, args.image_w))
    else:
        if args.synthetic:
            import tempfile

            from handnet_tpu.data.synthetic import make_synthetic_dexycb

            root = args.data_dir or tempfile.mkdtemp(prefix="synth_dexycb_")
            if not os.path.exists(os.path.join(root, "calibration")):
                make_synthetic_dexycb(root, n_sequences=args.synthetic,
                                      n_frames=4)
            ds = DexYCBDataset("s0", "train", data_dir=root)
        else:
            ds = DexYCBDataset("s0", "train", data_dir=args.data_dir)
        idx = refine_indices(ds, cache_path=os.path.join(
            args.output, "cache", "refined_train_idx.pkl"))
        src = DetectDataSource(ds, idx, e2e=True, uint8_images=True)
    print(f"train samples: {len(src)}")

    mesh = create_mesh()
    n_dev = mesh.devices.size
    batch = max(args.batch // n_dev * n_dev, n_dev)
    loader = PrefetchLoader(src, batch, shuffle=True,
                            num_workers=args.workers,
                            shard_id=jax.process_index(),
                            num_shards=jax.process_count())
    steps_per_epoch = max(len(loader), 1)

    model_cfg = FCOSConfig(num_classes=args.num_classes,
                           image_h=args.image_h, image_w=args.image_w)
    train_cfg = TrainConfig(batch_size=batch, lr=args.lr, bf16=args.bf16,
                            optimizer="sgd", warmup_epochs=1)
    if args.net == "rcnn":
        from handnet_tpu.train.trainer import RCNNTrainer

        trainer = RCNNTrainer(model_cfg, train_cfg, mesh=mesh,
                              steps_per_epoch=steps_per_epoch,
                              backbone_norm=args.backbone_norm,
                              num_proposals=args.num_proposals)
    else:
        trainer = FCOSTrainer(model_cfg, train_cfg, mesh=mesh,
                              steps_per_epoch=steps_per_epoch,
                              backbone_norm=args.backbone_norm)
    state = trainer.init_state(jax.random.PRNGKey(train_cfg.seed))

    ckpt = CheckpointManager(os.path.join(args.output, "checkpoints"))
    monitor = Monitor(args.output)
    start_epoch = 0
    if args.resume and ckpt.latest_epoch() is not None:
        state = ckpt.restore(state)
        start_epoch = ckpt.latest_epoch() + 1

    prep = jax.jit(lambda im: preprocess(im, model_cfg)[0])

    for epoch in range(start_epoch, args.epochs):
        loader.set_epoch(epoch)
        meters = AverageMeters()
        t0 = time.time()
        for batch_np in loader:
            # scale targets into network pixels (static resize factor)
            h, w = batch_np["image"].shape[1:3]
            scale = min(model_cfg.image_h / h, model_cfg.image_w / w)
            net_images = prep(jnp.asarray(batch_np["image"]))
            dev_batch = shard_batch(mesh, {
                "image": net_images,
                "targets": {
                    "boxes": jnp.asarray(batch_np["target_boxes"] * scale),
                    "labels": jnp.asarray(batch_np["target_labels"]),
                    "valid": jnp.asarray(batch_np["target_valid"]),
                    "box_info": jnp.asarray(batch_np["target_box_info"]),
                },
            })
            state, metrics = trainer.train_step(state, dev_batch)
            total = float(metrics["total_loss"])
            if not math.isfinite(total):
                # NaN guard (trainval_net_fcos.py:61-64)
                print("FATAL: non-finite loss, aborting", file=sys.stderr)
                sys.exit(1)
            meters.update({k: float(v) for k, v in metrics.items()})
        dt = time.time() - t0
        avg = meters.averages()
        print(f"epoch {epoch}: loss={avg.get('total_loss', 0):.4f} "
              f"({dt:.1f}s)")
        monitor.log_train(epoch, avg)
        ckpt.save(epoch, state)

    monitor.metrics.save_metrics()
    monitor.metrics.plot_metrics()


if __name__ == "__main__":
    main()
