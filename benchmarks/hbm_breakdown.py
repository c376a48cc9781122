"""HBM budget breakdown for the clip-tracking serving program.

VERDICT round-3 item 4: the b4 full-FlowTrack config (R152 + FlowNet2 @
384x288) fits ONE stream in a v5e-1's 15.75G HBM — two OOM. This tool
makes that ceiling auditable instead of asserted: it AOT-lowers the real
clip program for a given stream count (no execution, so an over-budget
program reports its requirement instead of crashing a run) and prints
XLA's own memory analysis — argument/output/temp bytes — plus the same
analysis for the two component programs (the pose pass on the clip's
crop batch, the flow net on the clip's pair batch) so the table shows
WHO holds the bytes.

Usage (real chip):
    python benchmarks/hbm_breakdown.py                    # headline cfg
    env BENCH_CFG=coco_res152_384x288 BENCH_FLOW=flownet2 \
        BREAKDOWN_CLIPS=1,2 python benchmarks/hbm_breakdown.py

One JSON line per (program, streams) combination.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def analysis_dict(compiled) -> dict:
    m = compiled.memory_analysis()
    if m is None:
        return {"memory_analysis": None}
    gib = 1024 ** 3
    return {
        "argument_gib": round(m.argument_size_in_bytes / gib, 3),
        "output_gib": round(m.output_size_in_bytes / gib, 3),
        "temp_gib": round(m.temp_size_in_bytes / gib, 3),
        "alias_gib": round(m.alias_size_in_bytes / gib, 3),
        "total_gib": round((m.argument_size_in_bytes
                            + m.output_size_in_bytes
                            + m.temp_size_in_bytes
                            - m.alias_size_in_bytes) / gib, 3),
    }


def emit(line: dict) -> None:
    print(json.dumps(line), flush=True)


def main() -> None:
    import bench
    from flowtrack_tpu import aot

    frames = int(os.environ.get("BENCH_FRAMES", "64"))
    persons = int(os.environ.get("BENCH_PERSONS", "8"))
    clip_counts = [int(c) for c in os.environ.get(
        "BREAKDOWN_CLIPS", "1,2").split(",")]

    tracker, h, w = bench.build_clip_tracker()
    specs1 = aot.clip_arg_specs(tracker, frames, (h, w))

    for c in clip_counts:
        specs = aot.clip_arg_specs(tracker, frames, (h, w),
                                   streams=c if c > 1 else None)
        fn = tracker._clips_fn if c > 1 else tracker._clip_fn
        try:
            compiled = fn.lower(*specs).compile()
            emit({"program": "clip_tracker", "streams": c,
                  "frames": frames, "persons": persons,
                  **analysis_dict(compiled)})
        except Exception as e:  # noqa: BLE001 — report, don't crash
            emit({"program": "clip_tracker", "streams": c,
                  "frames": frames, "persons": persons,
                  "compile_error": str(e)[-400:]})

    # component programs at the clip program's internal batch shapes:
    # pose on the flip-doubled crop batch, flow on the pair batch
    mdt = jnp.dtype(tracker.cfg.model.dtype)
    crop_batch = frames * tracker.num_slots * 2
    crops = jax.ShapeDtypeStruct((crop_batch, h, w, 3), mdt)

    def pose_fwd(pv, x):
        return tracker.pose_model.apply(pv, x, train=False)

    try:
        compiled = jax.jit(pose_fwd).lower(
            aot._abstract(tracker.pose_vars), crops).compile()
        emit({"program": "pose_forward", "crop_batch": crop_batch,
              **analysis_dict(compiled)})
    except Exception as e:  # noqa: BLE001
        emit({"program": "pose_forward", "crop_batch": crop_batch,
              "compile_error": str(e)[-400:]})

    fh, fw = -(-h // 64) * 64, -(-w // 64) * 64
    pairs = jax.ShapeDtypeStruct((frames - 1, fh, fw, 6), jnp.float32)

    def flow_fwd(fv, x):
        return tracker.flow_model.apply(fv, x, train=False)

    try:
        compiled = jax.jit(flow_fwd).lower(
            aot._abstract(tracker.flow_vars), pairs).compile()
        emit({"program": "flow_forward", "pair_batch": frames - 1,
              "pair_hw": [fh, fw], **analysis_dict(compiled)})
    except Exception as e:  # noqa: BLE001
        emit({"program": "flow_forward", "pair_batch": frames - 1,
              "compile_error": str(e)[-400:]})


if __name__ == "__main__":
    main()
