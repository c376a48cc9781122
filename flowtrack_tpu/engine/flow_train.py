"""FlowNet training step: multi-scale EPE (SURVEY.md section 3 FlowNetS
row: "trained on flow/20"; weights per the FlowNet paper schedule).

The reference repo consumes pretrained FlowNet checkpoints; the training
path is provided for completeness/finetuning — same TrainState machinery as
the pose engine.
"""

from __future__ import annotations

import jax
import optax

from flowtrack_tpu.engine.loss import epe, multiscale_epe
from flowtrack_tpu.engine.train import TrainState


def flow_train_step(state: TrainState, batch, div_flow: float = 20.0):
    """batch: dict(input (N, H, W, 6) preprocessed pairs,
    flow (N, H, W, 2) ground-truth full-res flow)."""

    def loss_fn(params):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
            pyramid, mutated = state.apply_fn(
                variables, batch["input"], train=True,
                mutable=["batch_stats"])
            stats = mutated["batch_stats"]
        else:
            pyramid = state.apply_fn(variables, batch["input"], train=True)
            stats = state.batch_stats
        loss = multiscale_epe(pyramid, batch["flow"], div_flow=div_flow)
        return loss, (pyramid[0], stats)

    (loss, (flow2, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    # report full-res EPE as the training metric
    n, hq, wq, _ = flow2.shape
    up = jax.image.resize(flow2 * div_flow,
                          (n, batch["flow"].shape[1],
                           batch["flow"].shape[2], 2), "bilinear")
    metric_epe = epe(up, batch["flow"])
    new_state = state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_stats, opt_state=new_opt)
    return new_state, {"loss": loss, "epe": metric_epe}
