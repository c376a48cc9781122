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
FRAMES = int(os.environ.get("BENCH_FRAMES", "64"))
PERSONS = int(os.environ.get("BENCH_PERSONS", "8"))
ORACLE_FRAMES = int(os.environ.get("BENCH_ORACLE_FRAMES", "3"))
BENCH_CFG = os.environ.get("BENCH_CFG", "coco_res50_256x192")
H, W = 256, 192


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
    bottleneck. Prints one json line per component (not the driver line)."""
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
    pose_fwd = jax.jit(lambda v, x: pose.apply(v, x, train=False))
    out = pose_fwd(pose_vars, crops)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(FRAMES):
        out = pose_fwd(pose_vars, crops)
    jax.block_until_ready(out)
    pose_dt = (time.perf_counter() - t0) / FRAMES
    print(json.dumps({"component": "pose_resnet50_x%d" % (2 * PERSONS),
                      "ms_per_frame": round(1000 * pose_dt, 3)}))

    flow_net = FlowNetS(dtype=jnp.bfloat16)
    x = preprocess_pair(rng.uniform(0, 255, (1, H, W, 3)),
                        rng.uniform(0, 255, (1, H, W, 3)))
    flow_vars = jax.jit(flow_net.init, static_argnames="train")(
        rngk, x, train=False)
    flow_fwd = jax.jit(lambda v, x: flow_net.apply(v, x, train=False))
    out = flow_fwd(flow_vars, x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(FRAMES):
        out = flow_fwd(flow_vars, x)
    jax.block_until_ready(out)
    flow_dt = (time.perf_counter() - t0) / FRAMES
    print(json.dumps({"component": "flownet_s_pair",
                      "ms_per_frame": round(1000 * flow_dt, 3)}))


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


def run_clip_bench():
    """Headline path: whole-clip batched tracking (tracking/clip_pipeline).

    Flow on all frame pairs in one call, pose on all F*P persons in one
    call, id chain as a device-side scan — one jit call per clip."""
    import jax
    import jax.numpy as jnp

    from flowtrack_tpu.config import get_config
    from flowtrack_tpu.models.flownet import FlowNetS
    from flowtrack_tpu.models.pose_resnet import get_pose_net
    from flowtrack_tpu.tracking.clip_pipeline import ClipTracker, \
        pad_detections

    from dataclasses import replace

    cfg = get_config(BENCH_CFG)
    if os.environ.get("BENCH_FLIP") == "0":
        cfg = replace(cfg, test=replace(cfg.test, flip_test=False))
    if os.environ.get("BENCH_RECOVER") == "0":
        # ablation: disable the detector-miss recovery pose pass
        cfg = replace(cfg, track=replace(cfg.track, clip_recover=False))
    h, w = cfg.model.image_size  # frames at model input res
    pose = get_pose_net(cfg.model)
    flow_variant = os.environ.get("BENCH_FLOW", "flownet_s")
    if flow_variant != "flownet_s":
        from dataclasses import replace

        from flowtrack_tpu.models.flownet import get_flow_net

        fcfg = replace(cfg.flow, variant=flow_variant,
                       use_pallas_corr=os.environ.get(
                           "BENCH_PALLAS_CORR", "1") == "1")
        cfg = replace(cfg, flow=fcfg)
        flow_net = get_flow_net(fcfg)
    else:
        flow_net = FlowNetS(dtype=jnp.bfloat16)
    rngk = jax.random.PRNGKey(0)
    pose_vars = jax.jit(pose.init, static_argnames="train")(
        rngk, jnp.zeros((1, h, w, 3)), train=False)
    # FlowNet init needs /64 dims (the clip pipeline resizes internally)
    fh, fw = -(-h // 64) * 64, -(-w // 64) * 64
    flow_vars = jax.jit(flow_net.init, static_argnames="train")(
        rngk, jnp.zeros((1, fh, fw, 6)), train=False)

    quant_mode = os.environ.get("BENCH_QUANT", "")
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
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 255, (FRAMES, h, w, 3)).astype(np.float32)
    boxes = [[[20 + 15 * p, 30 + 10 * p, 60, 90] for p in range(PERSONS)]
             for _ in range(FRAMES)]
    scores = [[0.9] * PERSONS for _ in range(FRAMES)]
    db, dsc, dv = pad_detections(boxes, scores, PERSONS)

    # Steady-state device throughput: the clip is prepared (H2D) outside
    # the timed region — in production H2D is pipelined with compute
    # (data/loader.device_prefetch); on this machine it also rides a slow
    # axon relay (~45 MB/s measured) that a real PCIe host doesn't have.
    args = tracker.prepare(frames, db, dsc, dv)
    out = tracker.run_prepared(args)  # compile
    jax.block_until_ready(out)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = tracker.run_prepared(args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    assert out[3].shape == (FRAMES, tracker.num_slots)

    # Auditable ceiling math: XLA's own flop count for the ENTIRE clip
    # program (pose+flow+decode+matching), per frame, and the implied MFU
    # against the chip's bf16 peak — so the "% of peak" claim is
    # recomputed from primary data on every run.
    extras = {}
    try:
        # cost_analysis on the LOWERED stage (pre-optimization HLO) when
        # the backend supports it; the axon relay returns None there, so
        # fall back to the compiled executable's analysis (second compile,
        # served from the compilation cache).
        lowered = tracker._clip_fn.lower(tracker.pose_vars,
                                         tracker.flow_vars, *args)
        ca = lowered.cost_analysis()
        if ca is None:
            ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            gflops_frame = flops / FRAMES / 1e9
            extras["gflops_per_frame"] = round(gflops_frame, 1)
            extras["tflops_per_sec"] = round(gflops_frame * FRAMES / dt / 1e3,
                                             1)
            extras["mfu_pct_of_197T_bf16"] = round(
                100.0 * flops / dt / 197e12, 1)
    except Exception:
        pass
    return FRAMES / dt, extras


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
    from flowtrack_tpu.engine.train import create_train_state
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


def run_oracle_bench():
    """Same per-frame work in torch-CPU (the measured denominator) —
    single source of truth lives in benchmarks/reference_oracle.py."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks.reference_oracle import measure_oracle_fps

    return measure_oracle_fps(ORACLE_FRAMES, PERSONS, H, W)


def main():
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
    if os.environ.get("BENCH_TRAIN") == "1":
        run_train_bench()
        return
    mode = os.environ.get("BENCH_MODE", "clip")
    extras = {}
    if mode == "clip":
        fps, extras = run_clip_bench()
    else:
        fps = run_tpu_bench()
    oracle_fps = None
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_oracle_fps.json")
    if os.environ.get("BENCH_SKIP_ORACLE") != "1":
        try:
            if os.path.exists(cache):
                oracle_fps = json.load(open(cache))["fps"]
            else:
                oracle_fps = run_oracle_bench()
                json.dump({"fps": oracle_fps}, open(cache, "w"))
        except Exception:
            oracle_fps = None

    from flowtrack_tpu.config import get_config

    ih, iw = get_config(BENCH_CFG).model.image_size
    flip = "no-flip" if os.environ.get("BENCH_FLIP") == "0" else "flip-test"
    out = {
        "metric": "pose+flow_tracking_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": f"frames/s ({ih}x{iw}, {PERSONS} persons, {flip}, "
                f"{FRAMES}-frame clips, {BENCH_CFG})",
        "vs_baseline": round(fps / oracle_fps, 2) if oracle_fps else None,
        "platform": platform,
        "oracle_fps_torch_cpu": round(oracle_fps, 3) if oracle_fps else None,
        **extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
