"""bench.py flop accounting — the chunked-program undercount (round-3
VERDICT weak #1).

XLA's cost_analysis counts a ``lax.map``/``while`` body ONCE, not body x
trip count: the round-3 HBM-boundary sweep showed every BENCH_POSE_CHUNK
run reporting 71.1 vs 196.5 GFLOPs/frame for the SAME semantic work,
corrupting MFU and the GPU-envelope north-star on chunked lines. bench.py
therefore takes the flop count of record from an UNCHUNKED single-clip
twin whenever track.pose_chunk/flow_chunk is set (chunked == unchunked is
pinned bitwise in test_clip_pipeline; clip flops are linear in the stream
count). These tests pin (a) the premise — the undercount is real and
observable — and (b) the contract — the unchunked twin of a chunked
tracker reports the chunked program's true (larger) flop count.
"""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bench
from flowtrack_tpu.config import Config, ModelConfig
from flowtrack_tpu.tracking.clip_pipeline import (ClipTracker,
                                                  _chunked_apply,
                                                  pad_detections)
from tests.test_clip_pipeline import HM_HW, IMG_HW, K, StubFlow, make_cfg


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_lax_map_flops_not_scaled_by_trip_count():
    """The premise: XLA reports a 4-trip lax.map at ~1/4 the true flops.

    If XLA ever fixes this (ratio reaches ~1), the unchunked-twin path in
    bench.run_clip_bench can be retired — this test failing on a new
    jaxlib is the signal."""
    w = jnp.ones((3, 3, 8, 8), jnp.float32)
    x = jnp.ones((32, 16, 16, 8), jnp.float32)
    full = bench.program_flops(jax.jit(lambda x: _conv(x, w)), x)
    chunked = bench.program_flops(
        jax.jit(lambda x: _chunked_apply(lambda c: _conv(c, w), x, 8)), x)
    assert full > 0
    # one body's worth plus slack; far below the real 4-body total
    assert chunked < 0.5 * full


class ConvStubPose:
    """Pose stub with one real conv so clip-program flops register."""

    def apply(self, variables, x, train=False):
        w = jnp.ones((3, 3, 3, K), jnp.float32) / (9.0 * 3)
        hm = _conv(x, w)
        return jax.image.resize(
            hm, (x.shape[0], HM_HW[0], HM_HW[1], K), "bilinear")


def _flops_of(tracker, args):
    return bench.program_flops(tracker._clip_fn, tracker.pose_vars,
                               tracker.flow_vars, *args,
                               *tracker.empty_seed())


def test_unchunked_twin_reports_chunked_programs_true_flops():
    cfg = make_cfg()
    chunked_cfg = replace(cfg, track=replace(cfg.track, pose_chunk=2))
    pose, flow = ConvStubPose(), StubFlow()
    f, p = 4, 4
    frames = np.zeros((f, *IMG_HW, 3), np.float32)
    boxes = [[[20 + 15 * q, 30 + 10 * q, 30, 30] for q in range(p)]
             for _ in range(f)]
    scores = [[0.9] * p for _ in range(f)]
    db, dsc, dv = pad_detections(boxes, scores, p)

    plain = ClipTracker(cfg, pose, {}, flow, {})
    chunked = ClipTracker(chunked_cfg, pose, {}, flow, {})
    args = plain.prepare(frames, db, dsc, dv)

    f_plain = _flops_of(plain, args)
    f_chunked = _flops_of(chunked, args)
    assert f_plain > 0
    # the undercount reaches the real clip program too...
    assert f_chunked < 0.9 * f_plain
    # ...and the twin bench.run_clip_bench builds (same cfg with chunking
    # zeroed) reports exactly the unchunked count for the same workload
    twin = ClipTracker(
        replace(chunked_cfg,
                track=replace(chunked_cfg.track, pose_chunk=0,
                              flow_chunk=0)),
        pose, {}, flow, {})
    f_twin = _flops_of(twin, args)
    assert f_twin == pytest.approx(f_plain, rel=0.01)


@pytest.mark.smoke
def test_gpu_envelope_math_pinned():
    """The north-star denominator (round-4 VERDICT item 7): the envelope
    is pure arithmetic from the run's own flop count — pin it so a silent
    edit to the peaks/utilizations can't move the >=10x goalpost."""
    lo, hi = bench.gpu_envelope(196.5)  # headline GFLOPs/frame
    assert lo == pytest.approx(0.30 * 8.9e12 / 196.5e9)   # GTX1080@30%
    assert hi == pytest.approx(0.60 * 15.7e12 / 196.5e9)  # V100@60%
    assert (lo, hi) == pytest.approx((13.588, 47.939), abs=5e-3)


def test_north_star_guard_flips_at_10x():
    """north_star_ok must be a hard >=10.0x test against the envelope's
    conservative (hi) bound, with the margin stated — the regression
    guard the driver capture carries every round."""
    hi = bench.gpu_envelope(196.5)[1]
    ok = bench.envelope_extras(10.05 * hi, 196.5)
    bad = bench.envelope_extras(9.95 * hi, 196.5)
    assert ok["north_star_ok"] is True
    assert bad["north_star_ok"] is False
    assert ok["north_star_margin_pct"] == pytest.approx(0.5, abs=0.1)
    assert bad["north_star_margin_pct"] == pytest.approx(-0.5, abs=0.1)
    # r4 driver capture: 488.6 f/s at 196.5 GF/frame — currently ~1.9%
    r4 = bench.envelope_extras(488.6, 196.5)
    assert r4["north_star_ok"] is True
    assert r4["vs_gpu_envelope"] == [10.2, 36.0]


@pytest.mark.smoke
def test_clip_failure_classifier_pinned():
    """The stream-halving fallback's error taxonomy (bench.
    classify_clip_failure). Three measured failure shapes must classify
    exactly: (a) real allocator exhaustion -> is_oom (halve); (b) the
    axon relay's opaque compile-time HTTP 500 — which HIDES the real
    'would exceed memory' text from str(e) (R152@384 C=8, 2026-08-20)
    -> opaque_500 (halve, possible OOM); (c) the Pallas 'memory space
    any' lowering error that a bare-'memory' match once swallowed
    (b4 2-stream, 2026-08-19) -> neither (re-raise)."""
    # (a) allocator exhaustion, both runtime and buffer-assignment forms
    assert bench.classify_clip_failure(
        "RESOURCE_EXHAUSTED: Out of memory allocating 19531250000 bytes"
    ) == (True, False)
    assert bench.classify_clip_failure(
        "AOT PJRT error: Allocation (size=21743271936) would exceed "
        "memory (size=17179869184)") == (True, False)
    # (b) the relay's opaque wrapper — the only text str(e) carries
    assert bench.classify_clip_failure(
        "INTERNAL: http://127.0.0.1:8083/remote_compile: HTTP 500: "
        "tpu_compile_helper subprocess exit code 1") == (False, True)
    # (c) lowering errors mentioning memory must NOT classify as OOM
    assert bench.classify_clip_failure(
        "Mosaic failed: cannot allocate ref in memory space any"
    ) == (False, False)
    assert bench.classify_clip_failure("ValueError: shapes differ") \
        == (False, False)


@pytest.mark.smoke
def test_north_star_guard_gated_to_headline_invocation():
    """The guard flag must appear ONLY on the default driver invocation:
    a BENCH_CFG override OR any workload-altering BENCH_* env (stream
    count, frames, flip, flow variant, ...) disqualifies — the round-5
    BENCH_CFG-only gate let `BENCH_CLIPS=1` commit a false-looking
    north_star_ok=false (431.8 f/s single stream = 9.0x, 2026-08-20).
    Oracle-handling knobs don't alter the measured workload and are
    exempt."""
    assert bench.is_headline_invocation({}) is True
    assert bench.is_headline_invocation({"BENCH_SKIP_ORACLE": "1"}) is True
    # explicit default BENCH_CFG still counts as the headline
    assert bench.is_headline_invocation(
        {"BENCH_CFG": "coco_res50_256x192"}) is True
    assert bench.is_headline_invocation(
        {"BENCH_CFG": "coco_res152_384x288"}) is False
    for knob, val in [("BENCH_CLIPS", "1"), ("BENCH_FRAMES", "64"),
                      ("BENCH_FLIP", "0"), ("BENCH_RECOVER", "0"),
                      ("BENCH_FLOW", "flownet2"),
                      ("BENCH_GLUE_DTYPE", "bfloat16"),
                      ("BENCH_POSE_CHUNK", "128"), ("BENCH_REPS", "16"),
                      ("BENCH_QUANT", "1"), ("BENCH_MODE", "frame")]:
        assert bench.is_headline_invocation({knob: val}) is False, knob
