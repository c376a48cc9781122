"""AOT-serialized serving programs (``jax.export``).

Compile-once deployment artifacts for the serving hot program: trace and
lower ``ClipTracker``'s jitted clip program ahead of time — including for
a DIFFERENT target platform (e.g. lower for ``tpu`` on a cpu build host)
— serialize the result into one self-contained blob (StableHLO + calling
convention), and reload it in a serving process without retracing.

TPU-native rationale: everything under jit is traced once and compiled
(SURVEY.md section 8); the artifact pins that compilation product so a
server restart pays deserialize + device compile only (compose with
``utils.profiling.enable_compilation_cache`` to also skip the compile).
Weights stay CALL ARGUMENTS, not baked-in constants — the relay rejects
programs with >100MB constants (CLAUDE.md) and the artifact stays small.

The blob is shape-specialized: one artifact per (clip_len, frame H/W,
max-person padding, optional stream-batch) geometry, exactly like the
live jit cache.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jax_export


def _abstract(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        tree)


def clip_arg_specs(tracker, clip_len: int, frame_hw: Tuple[int, int],
                   streams: Optional[int] = None):
    """ShapeDtypeStructs for the clip program's full argument list
    (pose_vars, flow_vars, 7 prepared clip args, 6 seed leaves), built by
    running the REAL host prep on zero inputs so padding/layout decisions
    can never drift from production."""
    h, w = frame_hw
    # the tracker's EFFECTIVE person padding (ClipTracker accepts a
    # max_persons override of cfg.track.max_persons; using the cfg value
    # here produced specs that rejected production-prepared args — caught
    # by dryrun_multichip's AOT layout)
    p = tracker.max_persons
    frames = np.zeros((clip_len, h, w, 3), np.float32)
    boxes = np.tile(np.asarray([0.0, 0.0, 1.0, 1.0], np.float32),
                    (clip_len, p, 1))
    prepared = tracker.prepare(frames, boxes,
                               np.zeros((clip_len, p), np.float32),
                               np.ones((clip_len, p), bool))
    seed = tracker.empty_seed()
    if streams is not None:
        prepared = tuple(
            jnp.broadcast_to(a, (streams,) + a.shape) for a in prepared)
        seed = tuple(jnp.broadcast_to(s, (streams,) + s.shape)
                     for s in seed)
    return _abstract((tracker.pose_vars, tracker.flow_vars)
                     + tuple(prepared) + tuple(seed))


def export_clip_program(tracker, clip_len: int, frame_hw: Tuple[int, int],
                        streams: Optional[int] = None,
                        platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize the clip tracking program (single clip, or the vmapped
    ``streams``-batched multi-stream serving layout) for the given
    geometry. ``platforms``: lowering targets (default: the current
    backend); pass ``("tpu",)`` or ``("tpu", "cpu")`` to build artifacts
    for other hosts."""
    specs = clip_arg_specs(tracker, clip_len, frame_hw, streams)
    fn = tracker._clips_fn if streams is not None else tracker._clip_fn
    exp = jax_export.export(fn, platforms=platforms)(*specs)
    return exp.serialize()


def load_clip_program(blob: bytes):
    """Deserialize an exported clip program. The returned callable has the
    clip program's positional signature
    ``(pose_vars, flow_vars, *prepared_args, *seed)`` and runs on any
    platform the artifact was lowered for."""
    return jax_export.deserialize(blob).call


def artifact_meta(tracker, clip_len: int, frame_hw: Tuple[int, int],
                  streams: Optional[int], platforms) -> str:
    """JSON sidecar describing an artifact's geometry (for serving-time
    sanity checks; the blob itself rejects shape mismatches at call
    time)."""
    return json.dumps({
        "program": "clip_tracker",
        "clip_len": clip_len,
        "frame_hw": list(frame_hw),
        "streams": streams,
        "platforms": list(platforms) if platforms else None,
        "max_persons": tracker.max_persons,
        "num_slots": tracker.num_slots,
        "num_joints": tracker.num_joints,
        "pose": tracker.cfg.model.num_layers,
        "flow": tracker.cfg.flow.variant,
    })
