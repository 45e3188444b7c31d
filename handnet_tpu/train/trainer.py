"""Jitted, mesh-sharded train steps for A2J and FCOS.

Replaces the reference's two training paths — the hand-written AMP loop of
trainval_net_fcos.py:26-105 and the LightningCLI wrapper of
trainval_net_a2j.py / a2j/a2j.py:252-366 — with two small explicit trainers:

* one ``TrainState`` (params + batch_stats + optax state),
* one jitted ``train_step`` compiled over a ``Mesh`` with the batch sharded on
  the ``data`` axis and params replicated (XLA inserts the gradient psum over
  ICI — the NCCL all_reduce equivalent),
* bf16 compute / fp32 params instead of CUDA AMP + GradScaler (TPUs need no
  loss scaling — SURVEY §2.7).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from handnet_tpu.config import A2JConfig, FCOSConfig, TrainConfig
from handnet_tpu.models.a2j import A2JSystem, a2j_loss, a2j_postprocess
from handnet_tpu.models.fcos import FCOSSystem, fcos_loss
from handnet_tpu.train.schedules import multistep_with_warmup, step_decay


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
        )


def make_optimizer(cfg: TrainConfig, schedule) -> optax.GradientTransformation:
    if cfg.optimizer == "adamw":
        return optax.adamw(schedule, weight_decay=cfg.weight_decay)
    if cfg.optimizer == "sgd":
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(schedule, momentum=0.9),
        )
    raise ValueError(cfg.optimizer)


def _dp_shardings(mesh: Mesh):
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return repl, data


class A2JTrainer:
    """A2J training: AdamW lr 3.5e-4 wd 1e-4, StepLR 0.2/10, bs 64
    (config/a2j.yaml:8-30); loss = cls + 3 * reg (a2j/a2j.py:224-238)."""

    def __init__(self, model_cfg: Optional[A2JConfig] = None,
                 train_cfg: Optional[TrainConfig] = None,
                 mesh: Optional[Mesh] = None,
                 steps_per_epoch: int = 1000):
        self.model_cfg = model_cfg or A2JConfig()
        if self.model_cfg.quant:
            # int8 is a serving-only path (round() has no useful gradient);
            # train full-precision, serve the same params with quant on
            self.model_cfg = dataclasses.replace(self.model_cfg, quant=False)
        self.train_cfg = train_cfg or TrainConfig()
        dtype = jnp.bfloat16 if self.train_cfg.bf16 else jnp.float32
        # plain BatchNorm is correct under pjit DP too: the batch mean/var
        # reductions become global-batch collectives automatically
        self.system = A2JSystem(self.model_cfg, norm="batch", dtype=dtype)
        self.mesh = mesh
        self.schedule = step_decay(self.train_cfg.lr, steps_per_epoch,
                                   self.train_cfg.lr_step,
                                   self.train_cfg.lr_gamma)
        self.tx = make_optimizer(self.train_cfg, self.schedule)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    def init_state(self, rng) -> TrainState:
        variables = self.system.init(rng)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
            tx=self.tx,
        )
        if self.mesh is not None:
            repl, _ = _dp_shardings(self.mesh)
            state = jax.device_put(state, repl)
        return state

    def _loss_fn(self, params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        heads, updates = self.system.module.apply(
            variables, batch["image"], train=True, mutable=["batch_stats"])
        cls_loss, reg_loss = a2j_loss(heads, batch["jt_uvd"],
                                      self.system.anchors,
                                      self.model_cfg.spatial_factor)
        reg_loss = reg_loss * self.model_cfg.reg_loss_factor
        total = cls_loss + reg_loss
        metrics = {"classification": cls_loss, "regression": reg_loss,
                   "total_loss": total}
        return total, (updates["batch_stats"], metrics)

    def _build_train_step(self) -> Callable:
        def step(state: TrainState, batch):
            grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
            (_, (new_bs, metrics)), grads = grad_fn(
                state.params, state.batch_stats, batch)
            return state.apply_gradients(grads, new_bs), metrics

        # donate the incoming TrainState: params + Adam moments dominate the
        # training HBM footprint, and the step is state -> new state, so XLA
        # can alias the update in place instead of holding both trees live
        # (a no-op on CPU, where donation is unsupported)
        if self.mesh is None:
            return jax.jit(step, donate_argnums=(0,))
        repl, data = _dp_shardings(self.mesh)
        batch_shard = {"image": data, "jt_uvd": data}
        return jax.jit(step, donate_argnums=(0,),
                       in_shardings=(repl, batch_shard),
                       out_shardings=(repl, repl))

    def _build_eval_step(self) -> Callable:
        def step(state: TrainState, batch):
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            heads = self.system.module.apply(variables, batch["image"],
                                             train=False)
            pred = a2j_postprocess(heads, self.system.anchors)
            rmse = jnp.sqrt(jnp.mean((batch["jt_uvd"] - pred) ** 2))
            return pred, rmse

        return jax.jit(step)

    def train_step(self, state: TrainState, batch) -> Tuple[TrainState, Dict]:
        return self._train_step(state, batch)

    def eval_step(self, state: TrainState, batch):
        return self._eval_step(state, batch)


class FCOSTrainer:
    """FCOS training: SGD/AdamW + MultiStepLR + warmup, loss dict summed
    (trainval_net_fcos.py:55-77,195-204)."""

    def __init__(self, model_cfg: Optional[FCOSConfig] = None,
                 train_cfg: Optional[TrainConfig] = None,
                 mesh: Optional[Mesh] = None,
                 steps_per_epoch: int = 1000,
                 milestones_epochs=(20, 35),
                 backbone_norm: str = "frozen"):
        """``backbone_norm``: "frozen" matches the reference recipe —
        torchvision-PRETRAINED resnet with FrozenBatchNorm2d
        (fcos.py:476 pretrained=True). Training from scratch (no converted
        weights) must pass "batch": frozen norm with identity statistics is
        no normalization at all, and box regression converges far worse
        (observed on the synthetic task: held-out IoU ~0.26)."""
        self.model_cfg = model_cfg or FCOSConfig()
        if self.model_cfg.quant:
            # serving-only path — see A2JTrainer
            self.model_cfg = dataclasses.replace(self.model_cfg, quant=False)
        if self.model_cfg.gn_fast_variance:
            # serving-only: the E[x^2]-E[x]^2 cancellation NaNs gradients
            # mid-training (config.py note); train exact / serve fast
            self.model_cfg = dataclasses.replace(self.model_cfg,
                                                 gn_fast_variance=False)
        self.train_cfg = train_cfg or TrainConfig()
        dtype = jnp.bfloat16 if self.train_cfg.bf16 else jnp.float32
        self.system = FCOSSystem(self.model_cfg, backbone_norm=backbone_norm,
                                 dtype=dtype)
        self._norm_trains = backbone_norm in ("batch", "batch_sync")
        self.mesh = mesh
        self.schedule = multistep_with_warmup(
            self.train_cfg.lr, steps_per_epoch, milestones_epochs,
            warmup_epochs=1.0 if self.train_cfg.warmup_epochs else 0.0)
        self.tx = make_optimizer(self.train_cfg, self.schedule)
        self._train_step = self._build_train_step()

    def init_state(self, rng) -> TrainState:
        variables = self.system.init(rng)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
            tx=self.tx,
        )
        if self.mesh is not None:
            repl, _ = _dp_shardings(self.mesh)
            state = jax.device_put(state, repl)
        return state

    def _loss_fn(self, params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        # train-mode forward ONLY for trainable norms: frozen norm has no
        # batch statistics to take, and the reference fine-tune recipe runs
        # the backbone in eval stats (torchvision FrozenBatchNorm2d)
        if self._norm_trains:
            head, updates = self.system.module.apply(
                variables, batch["image"], train=True,
                mutable=["batch_stats"])
            new_bs = updates["batch_stats"]
        else:
            head = self.system.module.apply(variables, batch["image"],
                                            train=False)
            new_bs = batch_stats
        losses = fcos_loss(head, batch["targets"], self.system.anchors,
                           self.system.anchor_sizes, self.system.level_slices,
                           self.model_cfg)
        total = sum(losses.values())
        losses["total_loss"] = total
        return total, (new_bs, losses)

    def _build_train_step(self) -> Callable:
        def step(state: TrainState, batch):
            grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
            (_, (new_bs, metrics)), grads = grad_fn(
                state.params, state.batch_stats, batch)
            return state.apply_gradients(grads, new_bs), metrics

        # donate the incoming TrainState (see A2JTrainer._build_train_step)
        if self.mesh is None:
            return jax.jit(step, donate_argnums=(0,))
        repl, data = _dp_shardings(self.mesh)
        batch_shard = {
            "image": data,
            "targets": {"boxes": data, "labels": data, "valid": data,
                        "box_info": data},
        }
        return jax.jit(step, donate_argnums=(0,),
                       in_shardings=(repl, batch_shard),
                       out_shardings=(repl, repl))

    def train_step(self, state: TrainState, batch) -> Tuple[TrainState, Dict]:
        return self._train_step(state, batch)


class RCNNTrainer:
    """Faster R-CNN training (the reference's ``--net resXX`` alternative,
    trainval_net_fcos.py:184-187): joint RPN + roi-head losses summed like
    its loop sums the loss dict (:55-77). Same optimizer/schedule family as
    FCOSTrainer; the per-step dropout rng (contact head) folds in
    ``state.step`` so the step stays a pure function of its inputs."""

    def __init__(self, model_cfg: Optional[FCOSConfig] = None,
                 train_cfg: Optional[TrainConfig] = None,
                 mesh: Optional[Mesh] = None,
                 steps_per_epoch: int = 1000,
                 milestones_epochs=(20, 35),
                 backbone_norm: str = "frozen",
                 num_proposals: int = 128):
        from handnet_tpu.models.faster_rcnn import (FasterRCNNFPN,
                                                    rpn_anchor_grid)

        self.model_cfg = model_cfg or FCOSConfig()
        self.train_cfg = train_cfg or TrainConfig()
        dtype = jnp.bfloat16 if self.train_cfg.bf16 else jnp.float32
        self.module = FasterRCNNFPN(
            num_classes=self.model_cfg.num_classes,
            image_h=self.model_cfg.image_h, image_w=self.model_cfg.image_w,
            num_proposals=num_proposals, backbone_norm=backbone_norm,
            dtype=dtype)
        self.anchors = jnp.asarray(rpn_anchor_grid(
            self.module.image_h, self.module.image_w, self.module.strides,
            self.module.anchor_sizes, self.module.aspect_ratios))
        self._norm_trains = backbone_norm in ("batch", "batch_sync")
        self.mesh = mesh
        self.schedule = multistep_with_warmup(
            self.train_cfg.lr, steps_per_epoch, milestones_epochs,
            warmup_epochs=1.0 if self.train_cfg.warmup_epochs else 0.0)
        self.tx = make_optimizer(self.train_cfg, self.schedule)
        self._base_rng = jax.random.PRNGKey(self.train_cfg.seed + 1)
        self._train_step = self._build_train_step()

    def init_state(self, rng) -> TrainState:
        x = jnp.zeros((1, self.module.image_h, self.module.image_w, 3),
                      jnp.float32)
        variables = self.module.init(rng, x, train=False)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
            tx=self.tx,
        )
        if self.mesh is not None:
            repl, _ = _dp_shardings(self.mesh)
            state = jax.device_put(state, repl)
        return state

    def _loss_fn(self, params, batch_stats, step, batch):
        from handnet_tpu.models.faster_rcnn import rcnn_loss, rpn_loss

        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        rngs = {"dropout": jax.random.fold_in(self._base_rng, step)}
        if self._norm_trains:
            out, updates = self.module.apply(
                variables, batch["image"], train=True,
                mutable=["batch_stats"], rngs=rngs)
            new_bs = updates["batch_stats"]
        else:
            out = self.module.apply(variables, batch["image"], train=True,
                                    rngs=rngs)
            new_bs = batch_stats
        losses = rcnn_loss(out, batch["targets"],
                           self.model_cfg.num_classes)
        losses.update(rpn_loss(out, self.anchors, batch["targets"]))
        total = sum(losses.values())
        losses["total_loss"] = total
        return total, (new_bs, losses)

    def _build_train_step(self) -> Callable:
        def step(state: TrainState, batch):
            grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
            (_, (new_bs, metrics)), grads = grad_fn(
                state.params, state.batch_stats, state.step, batch)
            return state.apply_gradients(grads, new_bs), metrics

        if self.mesh is None:
            return jax.jit(step, donate_argnums=(0,))
        repl, data = _dp_shardings(self.mesh)
        batch_shard = {
            "image": data,
            "targets": {"boxes": data, "labels": data, "valid": data,
                        "box_info": data},
        }
        return jax.jit(step, donate_argnums=(0,),
                       in_shardings=(repl, batch_shard),
                       out_shardings=(repl, repl))

    def train_step(self, state: TrainState, batch) -> Tuple[TrainState, Dict]:
        return self._train_step(state, batch)
