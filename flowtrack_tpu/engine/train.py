"""Jit'd train / eval steps + optimizer + LR schedule.

Behavior contract (SURVEY.md section 3 "Engine" row, section 4.1/4.2;
reference lineage: train.py / core/function.py): Adam lr=1e-3, x0.1 at
epochs 90 and 120, 140 epochs, JointsMSELoss with target_weight, per-batch
PCK accuracy meter; validate runs flip-test averaging then decode.

TPU-native: one donated, jit-compiled ``train_step`` (fwd + bwd + Adam +
BN-stat update + on-device accuracy), and one ``eval_step`` that fuses the
flip-test by stacking [x, flip(x)] into a single double-batch forward —
heatmaps never leave the device; decode is on-device too
(ops/decode.get_final_preds).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from flowtrack_tpu.config import Config
from flowtrack_tpu.engine.loss import joints_mse_loss
from flowtrack_tpu.engine.metrics import heatmap_accuracy
from flowtrack_tpu.ops.decode import get_final_preds, rescore
from flowtrack_tpu.ops.heatmap import merge_flip_test


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def make_lr_schedule(cfg: Config, steps_per_epoch: int):
    """Reference schedule: lr * factor^k after each epoch milestone."""
    boundaries = {
        int(e) * steps_per_epoch: cfg.train.lr_factor for e in cfg.train.lr_steps
    }
    return optax.piecewise_constant_schedule(cfg.train.lr, boundaries)


def make_optimizer(cfg: Config, steps_per_epoch: int = 1):
    sched = make_lr_schedule(cfg, steps_per_epoch)
    if cfg.train.optimizer == "adam":
        return optax.adam(sched), sched
    if cfg.train.optimizer == "sgd":
        return optax.sgd(sched, momentum=0.9), sched
    raise KeyError(cfg.train.optimizer)


def create_train_state(model, cfg: Config, rng, sample_input,
                       steps_per_epoch: int = 1,
                       variables: Optional[dict] = None) -> TrainState:
    if variables is None:
        # jitted init: the unjitted flax init runs ops one-by-one and takes
        # minutes for a ResNet on CPU (measured)
        variables = jax.jit(model.init, static_argnames="train")(
            rng, sample_input, train=False)
    tx, _ = make_optimizer(cfg, steps_per_epoch)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def train_step(state: TrainState, batch, use_target_weight: bool = True):
    """One SGD step. batch: dict(input (N,H,W,3) normalized, target (N,h,w,K),
    target_weight (N,K)). Returns (new_state, metrics dict).

    Jit/pjit-friendly: call via jax.jit(train_step, donate_argnums=0,
    static_argnums=2) — with a sharded batch, XLA inserts the gradient psum
    (the DataParallel equivalent).
    """

    def loss_fn(params):
        out, mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            batch["input"], train=True, mutable=["batch_stats"])
        tw = batch["target_weight"] if use_target_weight else None
        loss = joints_mse_loss(out, batch["target"], tw)
        return loss, (out, mutated["batch_stats"])

    (loss, (out, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    acc, _, cnt = heatmap_accuracy(out, batch["target"])
    new_state = state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_stats, opt_state=new_opt)
    return new_state, {"loss": loss, "acc": acc, "cnt": cnt}


def pose_forward_fn(model, variables, flip_test: bool, flip_pairs,
                    shift_heatmap: bool = True):
    """Inference forward with fused flip-test: one double-batch XLA call.

    NOTE: closes over ``variables`` — convenient for interactive use, but
    jitting the closure bakes the weights into the program as constants
    (breaks the >100MB relay limit, CLAUDE.md). For jitted pipelines use
    ``pose_forward_args_fn`` and pass variables as an argument."""
    fwd = pose_forward_args_fn(model, flip_test, flip_pairs, shift_heatmap)
    return lambda x: fwd(variables, x)


def pose_forward_args_fn(model, flip_test: bool, flip_pairs,
                         shift_heatmap: bool = True):
    """Like pose_forward_fn but variables are a call argument (jit-safe)."""

    def fwd(variables, x):
        if not flip_test:
            return model.apply(variables, x, train=False)
        both = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
        hm = model.apply(variables, both, train=False)
        n = x.shape[0]
        return merge_flip_test(hm[:n], hm[n:], flip_pairs,
                               shift=shift_heatmap)

    return fwd


def eval_step(model, variables, batch, cfg: Config, flip_pairs):
    """Validate-loop body (SURVEY.md section 4.2), fully on device:
    forward (+flip merge) -> decode -> rescore. Returns image-space preds,
    maxvals, rescored scores."""
    fwd = pose_forward_fn(model, variables, cfg.test.flip_test, flip_pairs,
                          cfg.test.shift_heatmap)
    hm = fwd(batch["input"])
    preds, maxvals = get_final_preds(hm, batch["center"], batch["scale"],
                                     post_process=cfg.test.post_process,
                                     blur_kernel=cfg.test.blur_kernel)
    scores = rescore(batch["score"], maxvals, cfg.test.in_vis_thre)
    return {"preds": preds, "maxvals": maxvals, "scores": scores}


def make_jit_train_step(use_target_weight: bool = True, donate: bool = True):
    fn = functools.partial(train_step, use_target_weight=use_target_weight)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())
