"""FlowNet training step: multi-scale EPE (SURVEY.md section 3 FlowNetS
row: "trained on flow/20"; weights per the FlowNet paper schedule).

The reference repo consumes pretrained FlowNet checkpoints; the training
path is provided for completeness/finetuning — same TrainState machinery as
the pose engine.

Single-net variants (flownet_s/c/sd) return the (flow2..flow6) pyramid
under ``train=True`` and train on the lineage's MultiScale loss. Cascade
variants (flownet2/_cs/_css) emit ONE full-resolution real-scale flow;
they fine-tune on plain EPE against the GT (the stacked lineage's
fine-tune loss — its sub-nets run with frozen normalization, matching the
cascade's hardcoded inference-mode stages).
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
            out, mutated = state.apply_fn(
                variables, batch["input"], train=True,
                mutable=["batch_stats"])
            stats = mutated["batch_stats"]
        else:
            out = state.apply_fn(variables, batch["input"], train=True)
            stats = state.batch_stats
        if isinstance(out, (tuple, list)):
            loss = multiscale_epe(out, batch["flow"], div_flow=div_flow)
            # full-res EPE as the training metric (flow2 is /4, /div_flow)
            n = out[0].shape[0]
            flow_full = jax.image.resize(
                out[0] * div_flow,
                (n, batch["flow"].shape[1], batch["flow"].shape[2], 2),
                "bilinear")
        else:
            # cascade: one full-resolution real-scale flow
            flow_full = out
            loss = epe(flow_full, batch["flow"])
        return loss, (flow_full, stats)

    (loss, (flow_full, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    metric_epe = epe(flow_full, batch["flow"])
    new_state = state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_stats, opt_state=new_opt)
    return new_state, {"loss": loss, "epe": metric_epe}
