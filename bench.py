"""Headline benchmark: end-to-end pose+flow tracking frames/sec/chip.

Measures the BASELINE.json metric — frames/sec/chip for pose+flow inference
at 256x192 — on the available accelerator, and compares against a measured
torch-CPU oracle of the same per-frame work (the reference's GPU fps was
never published; SURVEY.md section 7 requires the denominator to be
measured, so ``vs_baseline`` here is speedup over the from-scratch torch-CPU
oracle on identical inputs — the only reference implementation available on
this machine).

Per frame of work (SURVEY.md section 4.4 hot loop):
  * FlowNetS on the (prev, cur) 256x192 frame pair
  * PoseResNet-50 on PERSONS person crops with flip-test (2x batch)
  * on-device decode (argmax + quarter-pixel + inverse affine) + rescoring
  * flow propagation + OKS similarity + greedy matching

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

import numpy as np

# 64-frame clips amortize the ~7ms fixed per-clip cost (measured sweep:
# 16->375, 32->407, 64->429 f/s); production video clips are this long.
# 0 = per-workload default (run_clip_bench picks 48 for the headline
# pose+FlowNetS path, 64 for FlowNet2-cascade configs — the r4 equal-HBM
# geometry sweep, STATUS.md round-4 item 8)
_FRAMES_ENV = int(os.environ.get("BENCH_FRAMES", "0"))
FRAMES = _FRAMES_ENV or 64  # legacy per-frame path (run_tpu_bench)
PERSONS = int(os.environ.get("BENCH_PERSONS", "8"))
# denominator protocol (VERDICT round-2 item 2a): >=32 frames, min-of-k
ORACLE_FRAMES = int(os.environ.get("BENCH_ORACLE_FRAMES", "32"))
ORACLE_REPS = int(os.environ.get("BENCH_ORACLE_REPS", "3"))
BENCH_CFG = os.environ.get("BENCH_CFG", "coco_res50_256x192")
H, W = 256, 192
BF16_PEAK = 197e12  # v5e-class bf16 peak used for every MFU line


def build_tpu_step():
    import jax
    import jax.numpy as jnp

    from flowtrack_tpu.config import get_config
    from flowtrack_tpu.models.flownet import FlowNetS, preprocess_pair
    from flowtrack_tpu.models.pose_resnet import get_pose_net
    from flowtrack_tpu.ops.crop import crop_resize_normalize
    from flowtrack_tpu.ops.decode import get_final_preds, rescore
    from flowtrack_tpu.ops.heatmap import merge_flip_test
    from flowtrack_tpu.ops.oks import oks_matrix, pose_area
    from flowtrack_tpu.ops.warp import flow_gather
    from flowtrack_tpu.config import (COCO_FLIP_PAIRS, IMAGENET_MEAN,
                                      IMAGENET_STD)
    from flowtrack_tpu.tracking.tracker import greedy_match

    cfg = get_config(BENCH_CFG)
    pose = get_pose_net(cfg.model)
    flow_net = FlowNetS(dtype=jnp.bfloat16)
    rngk = jax.random.PRNGKey(0)
    pose_vars = jax.jit(pose.init, static_argnames="train")(
        rngk, jnp.zeros((1, H, W, 3)), train=False)
    flow_vars = jax.jit(flow_net.init, static_argnames="train")(
        rngk, jnp.zeros((1, H, W, 6)), train=False)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    def frame_step(pose_vars, flow_vars, prev_frame, frame, centers, scales,
                   scores, track_joints):
        # flow on the frame pair
        x = preprocess_pair(prev_frame[None], frame[None])
        flow_q = flow_net.apply(flow_vars, x, train=False)
        flow = jax.image.resize(flow_q * 20.0, (1, H, W, 2), "bilinear")[0]
        # fused matmul crop+normalize + pose (+fused flip test)
        crops = crop_resize_normalize(frame, centers, scales, (H, W),
                                      mean, std)
        both = jnp.concatenate([crops, crops[:, :, ::-1, :]], axis=0)
        hm = pose.apply(pose_vars, both, train=False)
        hm = merge_flip_test(hm[:PERSONS], hm[PERSONS:], COCO_FLIP_PAIRS)
        preds, maxvals = get_final_preds(hm, centers, scales)
        resc = rescore(scores, maxvals)
        # propagate + match
        prop = track_joints + flow_gather(flow, track_joints)
        sim = oks_matrix(prop, pose_area(prop), preds, pose_area(preds))
        assign = greedy_match(sim, 0.5)
        return preds, maxvals, resc, assign

    return jax.jit(frame_step), pose_vars, flow_vars


def run_component_bench():
    """BENCH_COMPONENTS=1: time pose-only and flow-only to locate the
    bottleneck. Prints one json line per component (not the driver line).

    Uses the in-jit amortized protocol (_amortized_ms) — a dispatch loop
    closed by block_until_ready is exactly the protocol CLAUDE.md documents
    as unreliable on this relay (large outputs return early, per-dispatch
    jitter up to 10x)."""
    import jax
    import jax.numpy as jnp

    from flowtrack_tpu.config import get_config
    from flowtrack_tpu.models.flownet import FlowNetS, preprocess_pair
    from flowtrack_tpu.models.pose_resnet import get_pose_net

    rng = np.random.default_rng(0)
    cfg = get_config(BENCH_CFG)
    pose = get_pose_net(cfg.model)
    rngk = jax.random.PRNGKey(0)
    crops = jnp.asarray(rng.normal(0, 1, (2 * PERSONS, H, W, 3)),
                        jnp.float32)
    pose_vars = jax.jit(pose.init, static_argnames="train")(
        rngk, crops[:1], train=False)
    pose_ms = _amortized_ms(lambda v, x: pose.apply(v, x, train=False),
                            pose_vars, crops)
    print(json.dumps({"component": "pose_resnet50_x%d" % (2 * PERSONS),
                      "ms_per_frame": round(pose_ms, 3)}))

    flow_net = FlowNetS(dtype=jnp.bfloat16)
    x = preprocess_pair(rng.uniform(0, 255, (1, H, W, 3)),
                        rng.uniform(0, 255, (1, H, W, 3)))
    flow_vars = jax.jit(flow_net.init, static_argnames="train")(
        rngk, x, train=False)
    flow_ms = _amortized_ms(lambda v, x: flow_net.apply(v, x, train=False),
                            flow_vars, x)
    print(json.dumps({"component": "flownet_s_pair",
                      "ms_per_frame": round(flow_ms, 3)}))


def run_tpu_bench():
    import jax
    import jax.numpy as jnp

    step, pose_vars, flow_vars = build_tpu_step()
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 255, (2, H, W, 3)), jnp.float32)
    centers = jnp.asarray(
        np.stack([rng.uniform(50, 150, PERSONS),
                  rng.uniform(80, 180, PERSONS)], 1), jnp.float32)
    scales = jnp.full((PERSONS, 2), 0.8, jnp.float32)
    scores = jnp.full((PERSONS,), 0.9, jnp.float32)
    tracks = jnp.asarray(rng.uniform(40, 160, (PERSONS, 17, 2)), jnp.float32)

    args = (pose_vars, flow_vars, frames[0], frames[1], centers, scales,
            scores, tracks)
    out = step(*args)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(FRAMES):
        out = step(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return FRAMES / dt


def build_clip_tracker(cfg_name=None, flow_variant=None):
    """Build the ClipTracker exactly as the headline bench runs it (all
    BENCH_* env knobs honored). Shared by run_clip_bench and
    benchmarks/hbm_breakdown.py so the audited memory numbers come from
    the same program the bench times. Returns (tracker, frame_h, frame_w).
    """
    import jax
    import jax.numpy as jnp

    from flowtrack_tpu.config import get_config
    from flowtrack_tpu.models.flownet import FlowNetS
    from flowtrack_tpu.models.pose_resnet import get_pose_net
    from flowtrack_tpu.tracking.clip_pipeline import ClipTracker

    from dataclasses import replace

    cfg = get_config(cfg_name or BENCH_CFG)
    if os.environ.get("BENCH_FLIP") == "0":
        cfg = replace(cfg, test=replace(cfg.test, flip_test=False))
    if os.environ.get("BENCH_RECOVER") == "0":
        # ablation: disable the detector-miss recovery pose pass
        cfg = replace(cfg, track=replace(cfg.track, clip_recover=False))
    if os.environ.get("BENCH_POSE_CHUNK"):
        # cap pose-backbone activation memory (lax.map chunks) so more
        # streams fit one program — see TrackConfig.pose_chunk
        cfg = replace(cfg, track=replace(
            cfg.track, pose_chunk=int(os.environ["BENCH_POSE_CHUNK"])))
    if os.environ.get("BENCH_FLOW_CHUNK"):
        cfg = replace(cfg, track=replace(
            cfg.track, flow_chunk=int(os.environ["BENCH_FLOW_CHUNK"])))
    h, w = cfg.model.image_size  # frames at model input res
    pose = get_pose_net(cfg.model)
    flow_variant = flow_variant or os.environ.get("BENCH_FLOW", "flownet_s")
    if flow_variant != "flownet_s":
        from dataclasses import replace

        from flowtrack_tpu.models.flownet import get_flow_net

        # BENCH_PALLAS_WARP: 0 = XLA slice-gather, 1 = shift-accumulate
        # kernel, mm/2 = matmul kernel (ops/warp.py). Default mm: measured
        # end-to-end on v5e-1 (2026-08-19) the packed-dy matmul kernel
        # lifts the full-FlowTrack b4 config 104.0 -> 165.6 f/s (25.7 ->
        # 40.9% MFU; 181.7 at 3 bf16-glue streams); the shift kernel
        # LOSES end-to-end (96.0) — its adaptive displacement ranges
        # widen under real cascade flow statistics (STATUS.md round-4
        # items 6 and 11).
        wflag = os.environ.get("BENCH_PALLAS_WARP", "mm")
        fcfg = replace(cfg.flow, variant=flow_variant,
                       use_pallas_corr=os.environ.get(
                           "BENCH_PALLAS_CORR", "1") == "1",
                       use_pallas_warp=wflag in ("1", "2", "mm"),
                       pallas_warp_impl="matmul" if wflag in ("2", "mm")
                       else "shift",
                       glue_dtype=os.environ.get(
                           "BENCH_GLUE_DTYPE", "float32"))
        cfg = replace(cfg, flow=fcfg)
        flow_net = get_flow_net(fcfg)
    else:
        flow_net = FlowNetS(dtype=jnp.bfloat16)
    rngk = jax.random.PRNGKey(0)
    quant_mode = os.environ.get("BENCH_QUANT", "")
    # skip the multi-minute bf16 relay init ONLY when the branch that will
    # actually execute replaces pose_vars with its own fp32 init — the
    # elif chain below gives BENCH_FUSED priority over the int8 modes, and
    # the fused path CONSUMES pose_vars
    quant_replaces = (quant_mode == "folded"
                      or (quant_mode in ("1", "mixed", "pre")
                          and os.environ.get("BENCH_FUSED") != "1"))
    if quant_replaces:
        pose_vars = None
    else:
        pose_vars = jax.jit(pose.init, static_argnames="train")(
            rngk, jnp.zeros((1, h, w, 3)), train=False)
    # FlowNet init needs /64 dims (the clip pipeline resizes internally)
    fh, fw = -(-h // 64) * 64, -(-w // 64) * 64
    flow_vars = jax.jit(flow_net.init, static_argnames="train")(
        rngk, jnp.zeros((1, fh, fw, 6)), train=False)

    if quant_mode == "folded":
        # BN-folded float path (no int8): isolates whether the BN
        # scale/shift epilogue costs anything under XLA fusion.
        from dataclasses import replace as _replace

        from flowtrack_tpu.models.quantize import (PoseResNetQ,
                                                   QuantPoseAdapter,
                                                   fold_pose_resnet,
                                                   make_quant_variables)

        fcfg = _replace(cfg.model, dtype="float32")
        fpose = get_pose_net(fcfg)
        fvars = jax.jit(fpose.init, static_argnames="train")(
            rngk, jnp.zeros((1, h, w, 3)), train=False)
        qmodel = PoseResNetQ(cfg=fcfg, compute_dtype=jnp.bfloat16)
        qvars = make_quant_variables(qmodel, fold_pose_resnet(fvars),
                                     jnp.zeros((1, h, w, 3)))

        class _FoldedAdapter(QuantPoseAdapter):
            def apply(self, variables, x, train=False):
                return self.qmodel.apply(variables, x, calibrate=False,
                                         quantized=False)

        pose, pose_vars = _FoldedAdapter(qmodel), qvars
    elif os.environ.get("BENCH_FUSED") == "1":
        # Pallas fused-stage backbone (ops/fused_resnet.py). Measured
        # SLOWER than plain XLA on this chip — kept runnable so the
        # falsification in the module docstring stays reproducible.
        from flowtrack_tpu.ops.fused_resnet import fuse_pose_model

        pose, pose_vars = fuse_pose_model(cfg.model, pose_vars)
    elif quant_mode in ("1", "mixed", "pre"):
        # int8 W8A8 pose (models/quantize.py). "mixed": int8 only where it
        # wins on this chip, bf16 elsewhere. "pre": full int8 with weights
        # stored int8 at conversion (no per-call weight requantization).
        # Calibration on one random crop batch (protocol timing only —
        # real deployments calibrate on data).
        from dataclasses import replace as _replace

        from flowtrack_tpu.models.quantize import quantize_pose_model

        fcfg = _replace(cfg.model, dtype="float32")
        fpose = get_pose_net(fcfg)
        fvars = jax.jit(fpose.init, static_argnames="train")(
            rngk, jnp.zeros((1, h, w, 3)), train=False)
        calib = jnp.asarray(np.random.default_rng(1).normal(
            0, 1, (PERSONS * 2, h, w, 3)), jnp.float32)
        pose, pose_vars = quantize_pose_model(
            fpose, fvars, fcfg, [calib], mixed=quant_mode == "mixed",
            prequantized=quant_mode == "pre",
            compute_dtype=jnp.bfloat16)

    tracker = ClipTracker(cfg, pose, pose_vars, flow_net, flow_vars,
                          max_persons=PERSONS)
    return tracker, h, w


def classify_clip_failure(err_text: str):
    """Classify a clip-program failure for the stream-halving fallback.

    Returns (is_oom, opaque_500). is_oom matches REAL allocator
    exhaustion only — a bare 'memory' substring once swallowed a Pallas
    'memory space any' BlockSpec lowering error and mis-reported it as
    an HBM OOM (b4 2-stream, 2026-08-19). opaque_500: the axon relay
    wraps COMPILE-time OOMs in an opaque 'remote_compile: HTTP 500'
    JaxRuntimeError — the real 'Allocation would exceed memory' text
    only reaches the relay's stderr stream, never str(e) (measured:
    R152@384 C=8, 2026-08-20). Through this relay an HTTP 500 at C>1 is
    indistinguishable from a genuine compile bug, so the fallback treats
    it as possibly-OOM and retries halved: a real bug re-raises
    unchanged once C reaches 1, and every error head is printed loudly,
    so nothing is silently swallowed."""
    msg = err_text.lower()
    is_oom = ("resource_exhausted" in msg or "out of memory" in msg
              or "exceeds the limit" in msg
              or "would exceed memory" in msg
              or "allocating" in msg and "hbm" in msg)
    opaque_500 = "remote_compile" in msg and "http 500" in msg
    return is_oom, opaque_500


def run_clip_bench(cfg_name=None, flow_variant=None):
    """Headline path: whole-clip batched tracking (tracking/clip_pipeline).

    Flow on all frame pairs in one call, pose on all F*P persons in one
    call, id chain as a device-side scan — one jit call per clip."""
    import jax
    import jax.numpy as jnp

    from dataclasses import replace

    from flowtrack_tpu.tracking.clip_pipeline import ClipTracker, \
        pad_detections

    tracker, h, w = build_clip_tracker(cfg_name, flow_variant)
    cfg = tracker.cfg
    rng = np.random.default_rng(0)
    # Per-workload clip geometry (BENCH_FRAMES/BENCH_CLIPS override).
    # Equal-HBM sweep on v5e-1 (2026-08-19, STATUS.md round-4 item 8): the
    # boundary sits at ~384 in-flight frames; at constant budget
    # MORE/SHORTER clips win (the serial per-clip id/recovery scans
    # shorten while the batched pose/flow work is budget-invariant) —
    # C8xF48 = 481.9 f/s > C12xF32 = 480.7 > C6xF64 = 481.2 > C16xF24 =
    # 459.4 (too short: fixed per-clip cost dominates). Cascade (FlowNet2)
    # configs keep F=64, C=1: 2 fp32-glue streams EXCEED HBM (the OOM
    # fallback would burn a wasted cascade compile every run); multiple
    # streams fit only with bf16 glue (BENCH_GLUE_DTYPE=bfloat16,
    # BENCH_CLIPS=3 -> 136.7 f/s with the mm warp kernel, the serving
    # option; C=4 OOMs).
    cascade = (flow_variant
               or os.environ.get("BENCH_FLOW", "flownet_s")) != "flownet_s"
    n_frames = _FRAMES_ENV or (64 if cascade else 48)
    frames = rng.uniform(0, 255, (n_frames, h, w, 3)).astype(np.float32)
    boxes = [[[20 + 15 * p, 30 + 10 * p, 60, 90] for p in range(PERSONS)]
             for _ in range(n_frames)]
    scores = [[0.9] * PERSONS for _ in range(n_frames)]
    db, dsc, dv = pad_detections(boxes, scores, PERSONS)

    # Steady-state device throughput: the clip is prepared (H2D) outside
    # the timed region — in production H2D is pipelined with compute
    # (data/loader.device_prefetch); on this machine it also rides a slow
    # axon relay (~45 MB/s measured) that a real PCIe host doesn't have.
    # BENCH_CLIPS=C batches C independent streams' clips into ONE program
    # (the track_clips serving layout): the flow/pose batches scale with
    # C, lifting MFU on the batch-bound small-spatial layers
    # (probe_flownet.py). On OOM we halve C and retry, so the default
    # degrades gracefully on smaller-memory chips.
    n_clips = int(os.environ.get("BENCH_CLIPS", "0")) \
        or (1 if cascade else 8)
    while True:
        try:
            if n_clips > 1:
                prepped = tracker.prepare(frames, db, dsc, dv)
                cargs = [jnp.broadcast_to(a, (n_clips,) + a.shape)
                         for a in prepped]
                cargs += [jnp.broadcast_to(s, (n_clips,) + s.shape)
                          for s in tracker.empty_seed()]

                def run():
                    return tracker._clips_fn(tracker.pose_vars,
                                             tracker.flow_vars, *cargs)

                out = run()  # compile
                jax.block_until_ready(out)
                # BENCH_REPS amortizes per-rep relay dispatch/readback
                # (steady-state serving runs an unbroken clip stream);
                # reps=8 vs 3 is worth ~+1% measured (r4 sweep)
                reps = int(os.environ.get("BENCH_REPS", "8"))
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = run()
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / reps / n_clips
                assert out[3].shape == (n_clips, n_frames,
                                        tracker.num_slots)
            else:
                args = tracker.prepare(frames, db, dsc, dv)
                out = tracker.run_prepared(args)  # compile
                jax.block_until_ready(out)
                reps = int(os.environ.get("BENCH_REPS", "8"))
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = tracker.run_prepared(args)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / reps
                assert out[3].shape == (n_frames, tracker.num_slots)
            break
        except Exception as e:  # noqa: BLE001 — OOM fallback only
            # match real allocator exhaustion only: a bare 'memory'
            # substring once swallowed a Pallas 'memory space any'
            # BlockSpec lowering error and mis-reported it as an HBM OOM
            # (b4 2-stream, 2026-08-19)
            is_oom, opaque_500 = classify_clip_failure(str(e))
            # always surface the head of the real error: a silently
            # swallowed or mis-classified exception cost a day of queue
            # time twice (Pallas-as-OOM; c8_f52's lost error)
            head = str(e)
            print(f"bench: clip program failed (oom={is_oom}, "
                  f"opaque_500={opaque_500}, C={n_clips}): {head[:500]}",
                  file=sys.stderr)
            if n_clips > 1 and (is_oom or opaque_500):
                why = ("exceeded HBM" if is_oom else
                       "failed opaquely in relay compile (possible OOM)")
                print(f"bench: {n_clips}-clip program {why}; "
                      f"retrying with {n_clips // 2}", file=sys.stderr)
                n_clips //= 2
                continue
            raise

    # Auditable ceiling math: XLA's own flop count for the ENTIRE clip
    # program (pose+flow+decode+matching), per frame, and the implied MFU
    # against the chip's bf16 peak — so the "% of peak" claim is
    # recomputed from primary data on every run.
    extras = {}
    single_clip = prepped if n_clips > 1 else args
    if n_clips > 1:
        extras["batched_streams"] = n_clips  # post-OOM-fallback value
    if cfg.track.pose_chunk or cfg.track.flow_chunk:
        # XLA's cost_analysis does NOT scale a lax.map/while body by its
        # trip count, so chunked programs under-report flops ~3x for
        # identical semantic work (round-3 sweep: 71.1 vs 196.5
        # GFLOPs/frame, same C=6 workload, only chunking toggled) — which
        # corrupts every derived figure incl. the GPU-envelope north-star.
        # Chunked == unchunked is pinned bitwise (test_clip_pipeline), and
        # clip-program flops are linear in the stream count, so the flop
        # count of record is the UNCHUNKED single-clip twin's. The twin is
        # only lowered/compiled for analysis, never executed (single-clip
        # unchunked always fits HBM even when C streams chunked don't).
        twin = ClipTracker(
            replace(cfg, track=replace(cfg.track, pose_chunk=0,
                                       flow_chunk=0)),
            tracker.pose_model, tracker.pose_vars,
            tracker.flow_model, tracker.flow_vars, max_persons=PERSONS)
        flops = program_flops(twin._clip_fn, twin.pose_vars,
                              twin.flow_vars, *single_clip,
                              *twin.empty_seed())
        extras["flops_source"] = "unchunked_single_clip_twin"
    elif n_clips > 1:
        flops = program_flops(tracker._clips_fn, tracker.pose_vars,
                              tracker.flow_vars, *cargs) / n_clips
    else:
        flops = program_flops(tracker._clip_fn, tracker.pose_vars,
                              tracker.flow_vars, *args,
                              *tracker.empty_seed())
    extras["frames_per_clip"] = n_frames
    if flops > 0:
        gflops_frame = flops / n_frames / 1e9
        extras["gflops_per_frame"] = round(gflops_frame, 1)
        extras["tflops_per_sec"] = round(gflops_frame * n_frames / dt / 1e3,
                                         1)
        extras["mfu_pct_of_197T_bf16"] = round(
            100.0 * flops / dt / BF16_PEAK, 1)
    return n_frames / dt, extras


def gpu_envelope(gflops_per_frame):
    """Analytic reference-GPU fps envelope for this run's own flop count
    (BASELINE.md "GPU envelope": the reference's fps was never published,
    so bound it from measured flops/frame against published fp32 peaks x a
    utilization envelope). Returns (lo_fps, hi_fps):
      lo = GTX 1080 (8.9 TFLOP/s fp32) @ 30% utilization
      hi = V100    (15.7 TFLOP/s fp32) @ 60% utilization
    The >=10x north-star (BASELINE.json) is judged against HI — the
    envelope's most conservative bound for us."""
    fl = gflops_per_frame * 1e9
    return 0.30 * 8.9e12 / fl, 0.60 * 15.7e12 / fl


NORTH_STAR_X = 10.0  # BASELINE.json: >=10x reference GPU fps per chip

# Env knobs that change the MEASURED WORKLOAD of the clip bench away
# from the headline configuration (the plain `python bench.py` the
# driver captures). Any of these set => the run is not the headline and
# must not carry the north-star guard flag (oracle-handling knobs like
# BENCH_SKIP_ORACLE don't alter the measured fps and are exempt).
HEADLINE_WORKLOAD_ENVS = (
    "BENCH_CLIPS", "BENCH_FRAMES", "BENCH_REPS",
    "BENCH_PERSONS", "BENCH_FLIP", "BENCH_RECOVER", "BENCH_FLOW",
    "BENCH_GLUE_DTYPE", "BENCH_POSE_CHUNK", "BENCH_FLOW_CHUNK",
    "BENCH_MODE", "BENCH_QUANT", "BENCH_PALLAS_CORR", "BENCH_PALLAS_WARP",
    "BENCH_FUSED")


def is_headline_invocation(env=os.environ):
    """True iff this run measures the headline workload the >=10x
    north-star is a claim about — the default driver invocation. The
    round-5 gate on BENCH_CFG alone still let workload overrides
    (e.g. BENCH_CLIPS=1 single-stream: 431.8 f/s = 9.0x, 2026-08-20)
    emit a false-looking north_star_ok=false into capture files.
    BENCH_CFG explicitly set TO the default still counts as headline."""
    if env.get("BENCH_CFG", "coco_res50_256x192") != "coco_res50_256x192":
        return False
    return not any(env.get(k) for k in HEADLINE_WORKLOAD_ENVS)


def envelope_extras(fps, gflops_per_frame):
    """The envelope + north-star fields of the headline JSON line, from
    primary data only (this run's fps and XLA flop count). north_star_ok
    is the REGRESSION GUARD: it must stay true at the default invocation —
    any semantic addition that erodes the margin below 10.0x flips it to
    false in the driver capture instead of surfacing at judging."""
    lo, hi = gpu_envelope(gflops_per_frame)
    return {
        "gpu_envelope_fps": [round(lo, 1), round(hi, 1)],
        "vs_gpu_envelope": [round(fps / hi, 1), round(fps / lo, 1)],
        "north_star_ok": bool(fps / hi >= NORTH_STAR_X),
        "north_star_margin_pct": round(100.0 * (fps / hi / NORTH_STAR_X
                                                - 1.0), 1),
    }


def program_flops(jitted, *args):
    """XLA's own flop count for one application of a jitted fn, so every
    "% of peak" claim is recomputed from primary data per run. Failures
    are SURFACED to stderr (VERDICT round-2 weak item 2 — a silent 0 would
    quietly drop the MFU extras from the headline JSON)."""
    try:
        # cost_analysis on the LOWERED stage (pre-optimization HLO) when
        # the backend supports it; the axon relay returns None there, so
        # fall back to the compiled executable's analysis (second compile,
        # served from the compilation cache).
        lowered = jitted.lower(*args)
        ca = lowered.cost_analysis()
        if ca is None:
            ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops <= 0:
            print("bench: cost_analysis returned no flops — MFU extras "
                  "omitted", file=sys.stderr)
        return flops
    except Exception as e:  # noqa: BLE001 — must never kill the bench line
        print(f"bench: cost_analysis failed ({type(e).__name__}: {e}) — "
              "MFU extras omitted", file=sys.stderr)
        return 0.0


def _amortized_ms(fn, *args, perturb=1, iters=8):
    """ms per application of ``fn`` — delegates to the machine's ONE
    trustworthy timing protocol (benchmarks/probe_stages.measure: in-jit
    fori_loop + scalar accumulator forced with float(); the axon relay
    does not reliably block in block_until_ready for large outputs,
    CLAUDE.md)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks.probe_stages import measure

    return measure(fn, *args, perturb=perturb, iters=iters)


def run_matrix():
    """BENCH_MATRIX=1: one auditable JSON line per BASELINE.json config
    (VERDICT round-2 item 3) — f/s (or poses/s / pairs/s) + XLA flop count
    + MFU for each of the five [B] configs:

      0. ResNet-50 @256x192 single-pose inference (flip + decode + rescore)
      1. ResNet-50 @384x288 flip-test + offset decode
      2. ResNet-152 @384x288 multi-person batch + device OKS-NMS
      3. FlowNetS frame-pair flow inference
      4. full FlowTrack: ResNet-152 pose + FlowNet2 cascade + tracking
         (the whole-clip pipeline, same path as the headline)
    """
    import jax
    import jax.numpy as jnp

    from flowtrack_tpu.config import COCO_FLIP_PAIRS, get_config
    from flowtrack_tpu.models.flownet import FlowNetS, preprocess_pair
    from flowtrack_tpu.models.pose_resnet import get_pose_net
    from flowtrack_tpu.ops.decode import get_final_preds, rescore
    from flowtrack_tpu.ops.heatmap import merge_flip_test
    from flowtrack_tpu.ops.nms import oks_nms
    from flowtrack_tpu.ops.oks import pose_area

    rng = np.random.default_rng(0)
    platform = jax.devices()[0].platform
    iters = int(os.environ.get("BENCH_MATRIX_ITERS", "8"))
    only = [s for s in os.environ.get("BENCH_MATRIX_ONLY", "").split(",")
            if s]

    def want(label):
        return not only or any(label.startswith(o) for o in only)

    def emit(config_label, item, per_sec, ms_per_item, flops_per_item,
             batch=None):
        line = {
            "config": config_label,
            "metric": f"{item}_per_sec_per_chip",
            "value": round(per_sec, 2),
            "unit": f"{item}/s",
            "ms_per_item": round(ms_per_item, 3),
            "platform": platform,
        }
        if batch is not None:
            line["batch"] = batch
        if flops_per_item > 0:
            line["gflops_per_item"] = round(flops_per_item / 1e9, 1)
            line["tflops_per_sec"] = round(
                flops_per_item * per_sec / 1e12, 1)
            line["mfu_pct_of_197T_bf16"] = round(
                100.0 * flops_per_item * per_sec / BF16_PEAK, 1)
        print(json.dumps(line), flush=True)

    def pose_eval_bench(label, cfg_name, batch, with_nms=False,
                        persons_per_img=PERSONS):
        cfg = get_config(cfg_name)
        ih, iw = cfg.model.image_size
        pose = get_pose_net(cfg.model)
        rngk = jax.random.PRNGKey(0)
        pose_vars = jax.jit(pose.init, static_argnames="train")(
            rngk, jnp.zeros((1, ih, iw, 3)), train=False)
        crops = jnp.asarray(rng.normal(0, 1, (batch, ih, iw, 3)),
                            jnp.float32)
        centers = jnp.asarray(np.stack([rng.uniform(100, 200, batch),
                                        rng.uniform(100, 200, batch)], 1),
                              jnp.float32)
        scales = jnp.full((batch, 2), 1.2, jnp.float32)
        scores = jnp.full((batch,), 0.9, jnp.float32)

        def fn(v, crops, centers, scales, scores):
            both = jnp.concatenate([crops, crops[:, :, ::-1, :]], axis=0)
            hm = pose.apply(v, both, train=False)
            hm = merge_flip_test(hm[:batch], hm[batch:], COCO_FLIP_PAIRS,
                                 shift=cfg.test.shift_heatmap)
            preds, maxvals = get_final_preds(
                hm, centers, scales, post_process=cfg.test.post_process)
            sc = rescore(scores, maxvals, cfg.test.in_vis_thre)
            if with_nms:
                pp = preds.reshape(-1, persons_per_img,
                                   cfg.model.num_joints, 2)
                ss = sc.reshape(-1, persons_per_img)
                keep = jax.vmap(
                    lambda kp, s: oks_nms(kp, s, pose_area(kp),
                                          cfg.test.oks_thre))(pp, ss)
                return preds, maxvals, sc, keep
            return preds, maxvals, sc

        args = (pose_vars, crops, centers, scales, scores)
        ms = _amortized_ms(fn, *args, perturb=1, iters=iters)
        flops = program_flops(jax.jit(fn), *args)
        emit(label, "poses", batch / (ms / 1e3), ms / batch, flops / batch,
             batch=batch)

    # [B] configs 0-2: pose eval programs (batch override for CI smokes).
    # Default batch 256: like FlowNetS (b3), the pose nets are BATCH-bound
    # at their small-spatial deep layers — measured b0 128/256/512 ->
    # 39.3/48.4/46.8% MFU, b2 64/256/512 -> 58.7/63.3/55.1% (v5e-1,
    # 2026-08-17); 256 is the sweet spot for all three.
    bo = int(os.environ.get("BENCH_MATRIX_BATCH", "0"))
    if want("b0"):
        pose_eval_bench("b0_res50_256x192_flip_decode",
                        "coco_res50_256x192", batch=bo or 256)
    if want("b1"):
        pose_eval_bench("b1_res50_384x288_flip_decode",
                        "coco_res50_384x288", batch=bo or 256)
    if want("b2"):
        # the per-image OKS-NMS reshape needs batch % persons == 0; round
        # the batch UP to a persons multiple (review finding)
        ppi = min(PERSONS, bo or 256)
        pose_eval_bench("b2_res152_384x288_batch_oksnms",
                        "coco_res152_384x288",
                        batch=-(-(bo or 256) // ppi) * ppi,
                        with_nms=True, persons_per_img=ppi)
    # p0: isolated R152@256x192 probe — NOT a BASELINE config (explicit
    # BENCH_MATRIX_ONLY=p0 only). The r5 per-stage trace shows b4's
    # device time is ~56% pose R152@256x192; this measures that net's
    # own MFU ceiling at b4's shapes so the gap can be attributed to the
    # pose net itself vs the surrounding program.
    if only and want("p0"):
        pose_eval_bench("p0_res152_256x192_flip_decode",
                        "coco_res152_256x192", batch=bo or 256)

    # [B] config 3: FlowNetS on frame pairs. Batch 256 (4 production
    # clips): the 8x6/4x3-spatial deep layers are BATCH-bound — measured
    # sweep 32/64/128/256 pairs -> 41.5/59.8/79.8/96.3 TFLOP/s
    # (benchmarks/probe_flownet.py sweep; STATUS.md round-3 notes)
    if want("b3"):
        flow_net = FlowNetS(dtype=jnp.bfloat16)
        n_pairs = bo or 256
        pairs = preprocess_pair(
            jnp.asarray(rng.uniform(0, 255, (n_pairs, H, W, 3)),
                        jnp.float32),
            jnp.asarray(rng.uniform(0, 255, (n_pairs, H, W, 3)),
                        jnp.float32))
        flow_vars = jax.jit(flow_net.init, static_argnames="train")(
            jax.random.PRNGKey(0), pairs[:1], train=False)

        def flow_fn(v, x):
            return flow_net.apply(v, x, train=False)

        ms = _amortized_ms(flow_fn, flow_vars, pairs, perturb=1,
                           iters=iters)
        flops = program_flops(jax.jit(flow_fn), flow_vars, pairs)
        emit("b3_flownet_s_pairs", "pairs", n_pairs / (ms / 1e3),
             ms / n_pairs, flops / n_pairs, batch=n_pairs)

    # [B] config 4: full FlowTrack — ResNet-152 pose + FlowNet2 cascade +
    # tracking via the whole-clip pipeline (flowtrack_posetrack preset) —
    # plus its serving-optimum variants as FIRST-CLASS matrix configs
    # (round-4 VERDICT item 3: every number quoted in STATUS must exist as
    # a committed, driver-reproducible JSON line):
    #   b4s    = 3 batched streams + bf16 cascade glue (the measured
    #            serving optimum; 4 streams OOM, STATUS r4 item 9)
    #   b4x384 = the 384x288 cascade — bf16 glue REQUIRED even for one
    #            stream (fp32 glue exceeds 15.75G HBM, audited in
    #            benchmarks/hbm_breakdown.py; STATUS r4 item 7)
    def cascade_line(label, cfg_name, env):
        if not want(label):
            return
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            fps, extras = run_clip_bench(cfg_name, "flownet2")
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        line = {
            "config": label,
            "metric": "pose+flow_tracking_frames_per_sec_per_chip",
            "value": round(fps, 2),
            "unit": f"frames/s ({PERSONS} persons, flip-test, "
                    f"{extras.get('frames_per_clip', FRAMES)}-frame clips,"
                    f" detector-miss recovery)",
            "platform": platform,
            **extras,
        }
        if env:
            line["env"] = env
        print(json.dumps(line), flush=True)

    cascade_line("b4_flowtrack_res152_flownet2", "flowtrack_posetrack", {})
    cascade_line("b4s_flowtrack_serving_3stream_bf16glue",
                 "flowtrack_posetrack",
                 {"BENCH_CLIPS": "3", "BENCH_GLUE_DTYPE": "bfloat16"})
    cascade_line("b4x384_flowtrack_res152_flownet2_384x288_bf16glue",
                 "coco_res152_384x288", {"BENCH_GLUE_DTYPE": "bfloat16"})


def run_accuracy_smoke():
    """BENCH_ACCURACY=1: closed-loop accuracy ON THE REAL CHIP (VERDICT
    round-1 item 7). Plants Gaussian GT heatmaps at known joints, runs the
    on-device decode path (argmax + quarter-pixel + inverse affine +
    rescore) on whatever jax.devices()[0] is, and scores with the in-repo
    COCO evaluator. Prints ONE json line with the on-device AP and the max
    decode round-trip error in image pixels."""
    import jax
    import jax.numpy as jnp

    from flowtrack_tpu.config import get_config
    from flowtrack_tpu.eval.coco_eval import COCOKeypointEval
    from flowtrack_tpu.ops.affine import affine_transform, \
        get_affine_transform
    from flowtrack_tpu.ops.decode import get_final_preds, rescore
    from flowtrack_tpu.ops.heatmap import generate_target_np
    from flowtrack_tpu.pipeline import batched_box_to_center_scale

    cfg = get_config(BENCH_CFG)
    ih, iw = cfg.model.image_size
    hh, hw = cfg.model.heatmap_size
    k = cfg.model.num_joints
    rng = np.random.default_rng(0)
    n_imgs, p = 8, PERSONS

    gts, hms, centers, scales, img_ids = [], [], [], [], []
    gt_joints = []
    for img in range(n_imgs):
        boxes = np.stack([
            rng.uniform(10, 300, p), rng.uniform(10, 300, p),
            rng.uniform(80, 160, p), rng.uniform(120, 220, p)], axis=1)
        c, s = batched_box_to_center_scale(boxes, iw / ih)
        for i in range(p):
            x0, y0, w, h = boxes[i]
            joints = np.stack([
                rng.uniform(x0 + 0.15 * w, x0 + 0.85 * w, k),
                rng.uniform(y0 + 0.15 * h, y0 + 0.85 * h, k)], axis=1)
            trans = get_affine_transform(c[i], s[i], 0.0, (iw, ih))
            joints_crop = affine_transform(joints, trans)
            hm, _ = generate_target_np(joints_crop, np.ones(k), (hh, hw),
                                       (ih, iw), cfg.model.sigma)
            hms.append(hm)
            gt_joints.append(joints)
            kp = np.concatenate([joints, np.full((k, 1), 2.0)],
                                axis=1).reshape(-1)
            gts.append({"image_id": img, "area": float(w * h),
                        "bbox": [float(x0), float(y0), float(w), float(h)],
                        "keypoints": kp.tolist(), "iscrowd": 0,
                        "num_keypoints": k})
            centers.append(c[i])
            scales.append(s[i])
            img_ids.append(img)

    decode = jax.jit(lambda h, c, s: get_final_preds(h, c, s))
    preds, maxvals = decode(jnp.asarray(np.stack(hms)),
                            jnp.asarray(np.stack(centers), jnp.float32),
                            jnp.asarray(np.stack(scales), jnp.float32))
    scores = rescore(jnp.ones(len(hms)), maxvals, cfg.test.in_vis_thre)
    preds = np.asarray(preds)
    err = float(np.abs(preds - np.stack(gt_joints)).max())

    dts = []
    for i in range(len(hms)):
        kp = np.concatenate([preds[i], np.asarray(maxvals)[i][:, None]],
                            axis=1).reshape(-1)
        dts.append({"image_id": img_ids[i], "keypoints": kp.tolist(),
                    "score": float(np.asarray(scores)[i])})
    stats = COCOKeypointEval(gts, dts).evaluate()
    print(json.dumps({
        "metric": "coco_ap_gt_heatmap_closed_loop_on_device",
        "value": round(stats["AP"], 4),
        "unit": f"AP ({len(hms)} poses, decode+affine+rescore on device)",
        "platform": jax.devices()[0].platform,
        "max_decode_err_px": round(err, 3),
        "AP50": round(stats["AP50"], 4), "AP75": round(stats["AP75"], 4),
    }))
    return stats["AP"], err


def run_track_accuracy_smoke():
    """BENCH_ACCURACY=track: the dropout-recovery MOTA closed loop ON THE
    REAL CHIP via the whole-clip path (VERDICT round-2 item 5 — the
    CPU-mesh twin is tests/test_clip_pipeline.py
    test_clip_recovery_mota_parity_with_streaming). The full clip program —
    fused crop, decode, budgeted recovery scan, id scan — runs on whatever
    jax.devices()[0] is; GT is the no-dropout run of the same program, so
    MOTA=1 requires the detector-miss recovery to bridge the dropped frame
    with the SAME id on hardware. Prints ONE json line."""
    import jax

    from flowtrack_tpu.eval.posetrack_eval import (evaluate_posetrack,
                                                   evaluate_posetrack_mot)
    from flowtrack_tpu.tracking.clip_pipeline import ClipTracker, \
        pad_detections
    from tests.test_clip_pipeline import (StubFlow, StubPose,
                                          _dropout_scenario, make_cfg)

    cfg = make_cfg()
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    f = 6
    frames, boxes, scores, _ = _dropout_scenario(f=f, drop_frame=3)

    # GT = the no-dropout clip run's detector-slot poses
    full_boxes = [list(b) for b in boxes]
    full_scores = [list(s) for s in scores]
    from tests.test_clip_pipeline import VEL
    full_boxes[3].append([90 + VEL[0] * 3 - 15, 60 + VEL[1] * 3 - 15,
                          30, 30])
    full_scores[3].append(0.8)
    db, dsc, dv = pad_detections(full_boxes, full_scores,
                                 cfg.track.max_persons)
    ref = tracker.track_clip(frames, db, dsc, dv)
    k = ref["joints"].shape[2]
    gt_seq = [[{"track_id": pid,
                "keypoints": np.concatenate(
                    [ref["joints"][t, pid], np.ones((k, 1))], axis=1),
                "head_size": 20.0} for pid in range(2)]
              for t in range(f)]

    db, dsc, dv = pad_detections(boxes, scores, cfg.track.max_persons)
    out = tracker.track_clip(frames, db, dsc, dv)
    pred_seq = []
    for t in range(f):
        items = []
        for s in range(out["valid"].shape[1]):
            if out["valid"][t, s]:
                items.append({
                    "track_id": int(out["ids"][t, s]),
                    "keypoints": np.concatenate(
                        [out["joints"][t, s],
                         out["maxvals"][t, s][:, None]], axis=1),
                    "score": float(out["scores"][t, s])})
        pred_seq.append(items)
    stats = evaluate_posetrack([gt_seq], [pred_seq])
    stats_mot = evaluate_posetrack_mot([gt_seq], [pred_seq])
    print(json.dumps({
        "metric": "posetrack_mota_dropout_recovery_closed_loop_on_device",
        "value": round(stats["MOTA"], 4),
        "unit": "MOTA (6-frame clip, detector miss at frame 3, clip path)",
        "platform": jax.devices()[0].platform,
        "mAP": round(stats["mAP"], 4),
        "num_switches": stats["num_switches"],
        "num_misses": stats["num_misses"],
        "num_fps": stats["num_fps"],
        "mota_accumulator_backend": round(stats_mot["MOTA"], 4),
    }))
    return stats["MOTA"]


def run_train_accuracy_smoke():
    """BENCH_ACCURACY=train: the full train->eval closed loop ON THE REAL
    CHIP — train a real PoseResNet-18 on the synthetic COCO fixture until
    COCO-AP clears a level random weights cannot (the CPU-mesh twin is
    tests/test_train_to_eval_loop.py). Puts the bf16/fp32 model numerics,
    the donated train step and the whole eval pipeline on hardware."""
    import tempfile
    from dataclasses import replace
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from flowtrack_tpu.config import (Config, ModelConfig, TestConfig,
                                      TrainConfig)
    from flowtrack_tpu.data import BatchLoader, COCODataset
    from flowtrack_tpu.engine.train import (create_train_state,
                                            make_jit_train_step)
    from flowtrack_tpu.models.pose_resnet import get_pose_net
    from tests.fixtures import make_coco_fixture
    from tools.test import run_validation

    tmp = Path(tempfile.mkdtemp())
    root, _, _ = make_coco_fixture(tmp, n_images=4, persons=2)
    cfg = Config(
        model=ModelConfig(num_layers=18, image_size=(64, 64),
                          heatmap_size=(16, 16), sigma=1.5,
                          dtype="float32"),
        train=TrainConfig(batch_size=8, lr=2e-3, flip_prob=0.0,
                          rot_factor=0.0, scale_factor=0.0),
        test=TestConfig(batch_size=8, use_gt_bbox=True, flip_test=False))
    cfg = replace(cfg, data=replace(cfg.data, root=root,
                                    test_set="val2017"))
    train_ds = COCODataset(cfg, root, "val2017", is_train=True)
    eval_ds = COCODataset(cfg, root, "val2017", is_train=False)
    model = get_pose_net(cfg.model)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)))
    step = make_jit_train_step(donate=False)
    loader = BatchLoader(train_ds, 8, shuffle=True, seed=0)
    t0 = time.perf_counter()
    loss = None
    for _ in range(60):
        for batch in loader:
            dev = {k: jnp.asarray(batch[k])
                   for k in ("input", "target", "target_weight")}
            state, m = step(state, dev)
            loss = m["loss"]
    train_s = time.perf_counter() - t0
    stats = run_validation(
        cfg, model, {"params": state.params,
                     "batch_stats": state.batch_stats}, dataset=eval_ds)
    print(json.dumps({
        "metric": "coco_ap_train_to_eval_closed_loop_on_device",
        "value": round(stats["AP"], 4),
        "unit": "AP after 60 epochs on the synthetic fixture",
        "platform": jax.devices()[0].platform,
        "final_loss": round(float(loss), 6),
        "train_seconds": round(train_s, 1),
    }))
    return stats["AP"]


def run_latency_bench(mode: str):
    """BENCH_LATENCY=1|stream: the serving layer's LATENCY surface
    (round-4 VERDICT item 1 — throughput alone does not characterize a
    serving layout; a frame can wait ~clip_len frames before its batched
    step). Emits ONE json line per invocation.

    mode "1": submit->emit latency of serving.MultiStreamTracker under a
    saturated soak (every frame available the instant it is wanted, so
    the measured latency is the PIPELINE's own: clip assembly + the
    batched device step + host readback — the input-rate wait of a paced
    camera is (clip_len-1-t)/fps arithmetic on top, set
    BENCH_LATENCY_PACE_FPS to measure it included). Knobs: BENCH_FRAMES
    (clip_len), BENCH_CLIPS (streams), BENCH_LATENCY_CLIPS (soak length
    per stream, default 3). The clip_len sweep 8/16/32/48 is the
    latency-vs-throughput trade published in README/STATUS.

    mode "stream": per-frame latency of the sequential streaming tracker
    (tracking.FlowTracker + PosePredictor/FlowPredictor — host-
    orchestrated: several jit calls + forced readbacks per frame),
    p50/p99 over BENCH_LATENCY_FRAMES (default 200) timed steps after
    warmup.

    mode "stream2": per-frame latency of the FUSED streaming step
    (serving.StreamingClipTracker — the whole-clip program at
    clip_len=2: one device call + one async-batched 5-leaf fetch per
    frame, track state carried device-side via the clip seed). The
    lowest-latency serving option on relay-taxed hosts; emits the same
    p50/p99 surface.

    Both run on whatever jax.devices()[0] is. On this machine every host
    readback additionally rides the axon relay (~30 ms, CLAUDE.md) that a
    PCIe host does not pay — the clip_len sweep's SHAPE is portable, the
    absolute floor is relay-taxed."""
    import jax

    tracker, h, w = build_clip_tracker()
    rng = np.random.default_rng(0)
    platform = jax.devices()[0].platform
    boxes = [[20.0 + 15 * p, 30.0 + 10 * p, 60.0, 90.0]
             for p in range(PERSONS)]
    scores = [0.9] * PERSONS

    if mode == "stream":
        from flowtrack_tpu.pipeline import FlowPredictor, PosePredictor
        from flowtrack_tpu.tracking.tracker import FlowTracker

        cfg = tracker.cfg
        pose_fn = PosePredictor(cfg, tracker.pose_vars,
                                model=tracker.pose_model,
                                max_persons=PERSONS)
        flow_fn = FlowPredictor(cfg, tracker.flow_vars,
                                model=tracker.flow_model)
        ft = FlowTracker(cfg, pose_fn, flow_fn)
        n = int(os.environ.get("BENCH_LATENCY_FRAMES", "200"))
        frames = rng.uniform(0, 255, (8, h, w, 3)).astype(np.float32)
        b = np.asarray(boxes, np.float32)
        s = np.asarray(scores, np.float32)
        for t in range(3):  # compile both programs (flow needs t>0)
            ft.step(frames[t % 8], b, s)
        lat = []
        for t in range(n):
            t0 = time.perf_counter()
            ft.step(frames[t % 8], b, s)
            lat.append((time.perf_counter() - t0) * 1e3)
        a = np.asarray(lat)
        print(json.dumps({
            "metric": "streaming_per_frame_latency_ms",
            "value": round(float(np.percentile(a, 50)), 2),
            "unit": f"ms/frame p50 ({h}x{w}, {PERSONS} persons, "
                    f"flip-test, one jit step per frame, {BENCH_CFG})",
            "p50_ms": round(float(np.percentile(a, 50)), 2),
            "p90_ms": round(float(np.percentile(a, 90)), 2),
            "p99_ms": round(float(np.percentile(a, 99)), 2),
            "frames": n,
            "throughput_fps": round(1e3 / a.mean(), 1),
            "platform": platform,
        }))
        return

    if mode == "stream2":
        # Fused per-frame streaming: the whole-clip program at clip_len=2
        # (clips overlap by one frame, so each call computes flow on the
        # new pair + pose on both frames + match, emits exactly ONE new
        # frame, and carries track state device-side). One device call +
        # one async-batched fetch per frame — the host-orchestrated
        # FlowTracker "stream" mode pays many small jit calls and forced
        # readbacks per frame instead; on relay hosts this fused mode is
        # the true latency floor.
        from flowtrack_tpu.serving import StreamingClipTracker

        dt = np.dtype(os.environ.get("BENCH_LATENCY_DTYPE", "float32"))
        st = StreamingClipTracker(tracker)
        n = int(os.environ.get("BENCH_LATENCY_FRAMES", "200"))
        frames = rng.uniform(0, 255, (8, h, w, 3)).astype(dt)
        for t in range(3):  # compile the 2-frame clip program (+ seeded)
            st.step(frames[t % 8], boxes, scores)
        st.reset_latency_stats()
        lat = []
        for t in range(n):
            t0 = time.perf_counter()
            emitted = st.step(frames[t % 8], boxes, scores)
            lat.append((time.perf_counter() - t0) * 1e3)
            assert len(emitted) == 1
        a = np.asarray(lat)
        print(json.dumps({
            "metric": "fused_streaming_per_frame_latency_ms",
            "value": round(float(np.percentile(a, 50)), 2),
            "unit": f"ms/frame p50 ({h}x{w}, {PERSONS} persons, "
                    f"flip-test, fused clip_len=2 step per frame, "
                    f"{BENCH_CFG})",
            "p50_ms": round(float(np.percentile(a, 50)), 2),
            "p90_ms": round(float(np.percentile(a, 90)), 2),
            "p99_ms": round(float(np.percentile(a, 99)), 2),
            "frames": n,
            "dtype": str(dt),
            "throughput_fps": round(1e3 / a.mean(), 1),
            "platform": platform,
        }))
        return

    from flowtrack_tpu.serving import MultiStreamTracker

    clip_len = _FRAMES_ENV or 48
    streams = int(os.environ.get("BENCH_CLIPS", "0")) or 8
    soak = int(os.environ.get("BENCH_LATENCY_CLIPS", "3"))
    pace = float(os.environ.get("BENCH_LATENCY_PACE_FPS", "0"))
    # BENCH_LATENCY_PIPELINE=1: dispatch batch t+1 while batch t computes
    # (serving.MultiStreamTracker pipeline_depth) — on this machine the
    # saturated soak is RELAY-bound (H2D + per-fresh-buffer staging tax,
    # CLAUDE.md), which is exactly what pipelining can hide.
    # BENCH_LATENCY_DTYPE=uint8: real video sources are uint8 (4x less
    # H2D than f32; accepted end-to-end since round 2).
    pipe = int(os.environ.get("BENCH_LATENCY_PIPELINE", "0"))
    dt = np.dtype(os.environ.get("BENCH_LATENCY_DTYPE", "float32"))
    mst = MultiStreamTracker(tracker, clip_len=clip_len,
                             batch_streams=streams, pipeline_depth=pipe)
    frames = rng.uniform(0, 255, (clip_len, h, w, 3)).astype(dt)

    def feed(n_rounds):
        """Submit one frame to every stream per round (all ready clips
        step as soon as the batch fills); returns frames emitted."""
        emitted = 0
        next_t = time.perf_counter()
        for t in range(n_rounds):
            if pace:
                next_t += 1.0 / pace
                dt = next_t - time.perf_counter()
                if dt > 0:
                    time.sleep(dt)
            for sid in range(streams):
                mst.submit(sid, frames[t % clip_len], boxes, scores)
            for _sid, _first, tracks in mst.step():
                emitted += len(tracks)
        return emitted

    feed(clip_len)          # warmup: compiles the batched clip program
    if pipe:                # surface the warmup batch before the soak
        for _sid, _first, tracks in mst.step(force=True):
            pass
    mst.reset_latency_stats()
    t0 = time.perf_counter()
    emitted = feed(soak * clip_len)
    if pipe:                # drain the last in-flight batch
        for _sid, _first, tracks in mst.step(force=True):
            emitted += len(tracks)
    wall = time.perf_counter() - t0
    stats = mst.latency_stats()
    print(json.dumps({
        "metric": "serving_submit_to_emit_latency_ms",
        "value": stats.get("p50_ms"),
        "unit": f"ms submit->emit p50 ({h}x{w}, {PERSONS} persons, "
                f"clip_len {clip_len}, {streams} streams, "
                f"{'paced %.0f fps' % pace if pace else 'saturated'}, "
                f"{BENCH_CFG})",
        **stats,
        "clip_len": clip_len,
        "streams": streams,
        "soak_clips_per_stream": soak,
        "pace_fps": pace,
        "pipeline_depth": pipe,
        "frame_dtype": str(dt),
        "throughput_fps": round(emitted / wall, 1),
        "platform": platform,
    }))


def run_train_bench():
    """BENCH_TRAIN=1: pose-training throughput on the chip — samples/sec
    for the donated jit train step (ResNet-50 @256x192, reference recipe:
    Adam + JointsMSELoss with target weights; SURVEY.md section 4.1 hot
    loop). Synthetic batches stay on device (one H2D outside the timed
    region); prints one json line."""
    import jax
    import jax.numpy as jnp

    from flowtrack_tpu.config import get_config
    from flowtrack_tpu.engine.train import create_train_state
    from flowtrack_tpu.models.pose_resnet import get_pose_net

    cfg = get_config(BENCH_CFG)
    bs = int(os.environ.get("BENCH_TRAIN_BATCH", cfg.train.batch_size))
    ih, iw = cfg.model.image_size
    hh, hw = cfg.model.heatmap_size
    k = cfg.model.num_joints
    rng = np.random.default_rng(0)
    model = get_pose_net(cfg.model)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((1, ih, iw, 3)))
    batch = {
        "input": jnp.asarray(rng.normal(0, 1, (bs, ih, iw, 3)),
                             jnp.float32),
        "target": jnp.asarray(rng.uniform(0, 1, (bs, hh, hw, k)),
                              jnp.float32),
        "target_weight": jnp.ones((bs, k), jnp.float32),
    }
    # timed via an in-jit scan (CLAUDE.md: per-call relay dispatch overhead
    # and unreliable block_until_ready corrupt loop-around-dispatch
    # timings; chain steps inside ONE program instead)
    from flowtrack_tpu.engine.train import train_step

    steps = 8

    def many_steps(state, batch):
        def body(st, _):
            st2, m = train_step(st, batch)
            return st2, m["loss"]
        _, losses = jax.lax.scan(body, state, None, length=steps)
        return losses[-1]

    ms_fn = jax.jit(many_steps)
    _ = float(ms_fn(state, batch))  # compile
    times = []
    for r in range(2):
        b2 = dict(batch)
        b2["input"] = batch["input"] + r
        t0 = time.perf_counter()
        _ = float(ms_fn(state, b2))
        times.append(time.perf_counter() - t0)
    dt = min(times) / steps
    print(json.dumps({
        "metric": "pose_train_samples_per_sec_per_chip",
        "value": round(bs / dt, 1),
        "unit": f"samples/s (train, batch {bs}, {BENCH_CFG})",
        "ms_per_step": round(1000 * dt, 2),
        "platform": jax.devices()[0].platform,
    }))
    return bs / dt


def run_oracle_bench(num_layers=50, h=None, w=None, flip=True):
    """Same per-frame work in torch-CPU (the measured denominator) —
    single source of truth lives in benchmarks/reference_oracle.py.
    Parametric over BENCH_CFG's depth/resolution and BENCH_FLIP so
    vs_baseline always divides by the SAME workload the numerator ran.
    Returns the min-of-k stats dict."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks.reference_oracle import measure_oracle_fps

    return measure_oracle_fps(ORACLE_FRAMES, PERSONS, h or H, w or W,
                              reps=ORACLE_REPS, num_layers=num_layers,
                              flip=flip)


def probe_backend() -> None:
    """Fail fast if the accelerator backend is unreachable.

    During axon relay outages ``jax.devices()`` HANGS indefinitely (observed
    >10 h on 2026-08-17/18, CLAUDE.md) — a driver-run bench would hang the
    whole round.  Probe backend init in a SUBPROCESS with a bounded timeout
    and emit a diagnostic JSON line instead of hanging.  Skipped when the
    requested platform is cpu (tests / virtual meshes never hang) or via
    BENCH_NO_PROBE=1.
    """
    import subprocess

    if os.environ.get("BENCH_NO_PROBE") == "1":
        return
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return
    timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "300"))
    err = None
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout)
        if r.returncode != 0:
            err = f"backend init failed: {(r.stderr or '').strip()[-300:]}"
    except subprocess.TimeoutExpired:
        err = f"backend init hung >{timeout:.0f}s (relay outage?)"
    if err is not None:
        print(json.dumps({
            "metric": "pose+flow_tracking_frames_per_sec_per_chip",
            "value": 0.0,
            "unit": "frames/s (accelerator unreachable)",
            "vs_baseline": None,
            "error": err,
        }))
        sys.exit(2)


def enable_compile_cache() -> None:
    """Persistent XLA compilation cache for bench runs.

    A fresh-process TPU compile costs minutes on this relay (CLAUDE.md);
    the experiment queue and the driver's end-of-round run both pay it for
    every invocation.  Default to a repo-local cache dir (same mechanism
    the CLIs expose via --compile-cache); opt out with
    ``FLOWTRACK_COMPILE_CACHE=""`` or point it elsewhere via the env var.
    """
    try:
        from flowtrack_tpu.utils.profiling import (
            default_compile_cache_dir, enable_compilation_cache)

        cache_dir = default_compile_cache_dir()
        if not cache_dir:
            return
        enable_compilation_cache(cache_dir)
    except Exception as e:  # noqa: BLE001 — cache is an optimization only
        print(f"bench: compilation cache unavailable ({e})", file=sys.stderr)


def main():
    probe_backend()
    enable_compile_cache()
    import jax

    platform = jax.devices()[0].platform
    if os.environ.get("BENCH_COMPONENTS") == "1":
        run_component_bench()
        return
    if os.environ.get("BENCH_ACCURACY") == "1":
        run_accuracy_smoke()
        return
    if os.environ.get("BENCH_ACCURACY") == "train":
        run_train_accuracy_smoke()
        return
    if os.environ.get("BENCH_ACCURACY") == "track":
        run_track_accuracy_smoke()
        return
    if os.environ.get("BENCH_TRAIN") == "1":
        run_train_bench()
        return
    if os.environ.get("BENCH_LATENCY"):
        run_latency_bench(os.environ["BENCH_LATENCY"])
        return
    if os.environ.get("BENCH_MATRIX") == "1":
        run_matrix()
        return
    mode = os.environ.get("BENCH_MODE", "clip")
    extras = {}
    if mode == "clip":
        fps, extras = run_clip_bench()
    else:
        fps = run_tpu_bench()
    from flowtrack_tpu.config import get_config

    bench_model = get_config(BENCH_CFG).model
    ih, iw = bench_model.image_size
    oracle_flip = os.environ.get("BENCH_FLIP") != "0"
    if mode != "clip":
        # the legacy per-frame step (run_tpu_bench) runs at the module's
        # fixed 256x192 with flip always fused in — the denominator and
        # the unit string must describe THAT workload, not BENCH_CFG's
        ih, iw, oracle_flip = H, W, True
    oracle = None
    # the cache key must pin the FULL measurement geometry — a cached
    # 8-person res50 denominator must not vouch for a 16-person or
    # res152@384 run (review findings)
    protocol = (f"min-of-{ORACLE_REPS}x{ORACLE_FRAMES}f"
                f"-{PERSONS}p-r{bench_model.num_layers}-{ih}x{iw}"
                f"-{'flip' if oracle_flip else 'noflip'}")
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_oracle_fps.json")
    if os.environ.get("BENCH_SKIP_ORACLE") != "1":
        # multi-slot cache keyed by protocol: experiment queues alternate
        # configs (headline <-> b4), and a single-slot cache forced a
        # fresh multi-minute torch-CPU measurement on every switch —
        # usually under the queue's own CPU contention, which corrupts
        # the denominator in our favor. Old single-slot format
        # ({"protocol": ..., "stats": ...}) is migrated on read.
        slots = {}
        try:
            c = json.load(open(cache))
            slots = c if "protocol" not in c else {c["protocol"]: c["stats"]}
            oracle = slots.get(protocol)
        except FileNotFoundError:
            pass
        except Exception as e:  # noqa: BLE001 — bad cache must not stick
            print(f"bench: discarding unreadable oracle cache ({e})",
                  file=sys.stderr)
            try:
                os.remove(cache)
            except OSError:
                pass
        if oracle is None or os.environ.get("BENCH_REFRESH_ORACLE") == "1":
            try:
                fresh = run_oracle_bench(bench_model.num_layers, ih, iw,
                                         oracle_flip)
                # Keep the FASTEST oracle seen for this protocol: host
                # contention only ever slows the torch-CPU reference, so a
                # contended measurement understates the denominator and
                # inflates vs_baseline in our favor (r4g queue measured
                # 0.084 f/s for a protocol that idles at ~0.32).
                # max-over-runs of min-of-k is the conservative-against-us
                # denominator; the per-run reps/spread stay recorded.
                if oracle is None or fresh["fps"] > oracle["fps"]:
                    oracle = fresh
                slots[protocol] = oracle
                json.dump(slots, open(cache, "w"))
            except Exception as e:  # noqa: BLE001 — must not kill bench
                print(f"bench: oracle measurement failed ({e})",
                      file=sys.stderr)
                oracle = None

    flip = "flip-test" if oracle_flip else "no-flip"
    nstreams = extras.get("batched_streams", 1)
    streams = f"{nstreams} batched streams, " if nstreams > 1 else ""
    out = {
        "metric": "pose+flow_tracking_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": f"frames/s ({ih}x{iw}, {PERSONS} persons, {flip}, "
                f"{extras.get('frames_per_clip', FRAMES)}-frame clips, "
                f"{streams}{BENCH_CFG})",
        "vs_baseline": round(fps / oracle["fps"], 2) if oracle else None,
        "platform": platform,
        "oracle_fps_torch_cpu": round(oracle["fps"], 3) if oracle else None,
        "oracle_protocol": protocol if oracle else None,
        "oracle_rep_fps": oracle["rep_fps"] if oracle else None,
        "oracle_spread_pct": oracle["spread_pct"] if oracle else None,
        **extras,
    }
    # analytic reference-GPU envelope + the north-star regression guard
    # (gpu_envelope/envelope_extras; math pinned by tests/test_bench_flops)
    if extras.get("gflops_per_frame"):
        out.update(envelope_extras(fps, extras["gflops_per_frame"]))
        if not is_headline_invocation():
            # the >=10x north-star is a claim about the HEADLINE workload
            # (the default invocation the driver captures); any config or
            # workload override keeps the informative envelope ratio but
            # must not emit a false-looking guard flag into committed
            # artifacts (see is_headline_invocation)
            out.pop("north_star_ok"), out.pop("north_star_margin_pct")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
