"""AOT program export (flowtrack_tpu/aot.py): serialized clip programs
must reproduce the live jitted tracker bitwise — single clip, cross-clip
seed chaining, and the vmapped multi-stream layout — and the CLI must
write a reloadable artifact."""

import json
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flowtrack_tpu import aot
from tests.test_clip_pipeline import default_tracker

F, H, W, P = 5, 128, 160, 4


def _scenario(seed=0):
    rng = np.random.default_rng(seed)
    frames = rng.uniform(0, 255, (F, H, W, 3)).astype(np.float32)
    boxes = np.tile(np.asarray([10.0, 10.0, 30.0, 40.0], np.float32),
                    (F, P, 1))
    boxes[:, 1, 0] += 60.0
    scores = np.full((F, P), 0.9, np.float32)
    valid = np.zeros((F, P), bool)
    valid[:, :2] = True
    return frames, boxes, scores, valid


def _assert_trees_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_aot_clip_bitwise_and_seed_chain():
    tracker = default_tracker()
    call = aot.load_clip_program(
        aot.export_clip_program(tracker, F, (H, W)))

    args1 = tracker.prepare(*_scenario(0))
    args2 = tracker.prepare(*_scenario(1))
    live1 = tracker.run_prepared(args1)
    live2 = tracker.run_prepared(args2, seed=live1[5])

    aot1 = call(tracker.pose_vars, tracker.flow_vars, *args1,
                *tracker.empty_seed())
    _assert_trees_equal(live1, aot1)
    # cross-clip continuity: the artifact's seed_out feeds its next call
    aot2 = call(tracker.pose_vars, tracker.flow_vars, *args2, *aot1[5])
    _assert_trees_equal(live2, aot2)


def test_aot_streams_layout_bitwise():
    """The vmapped multi-stream serving program exports too and matches
    track_clips (the headline bench layout)."""
    tracker = default_tracker()
    call = aot.load_clip_program(
        aot.export_clip_program(tracker, F, (H, W), streams=2))

    scen = [_scenario(2), _scenario(3)]
    stack = [np.stack([s[i] for s in scen]) for i in range(4)]
    live = tracker.track_clips(*stack)

    prepped = [tracker.prepare(*s) for s in scen]
    args = [jnp.stack([p[j] for p in prepped]) for j in range(7)]
    args += [jnp.broadcast_to(s, (2,) + s.shape)
             for s in tracker.empty_seed()]
    out = call(tracker.pose_vars, tracker.flow_vars, *args)
    ids = np.asarray(out[3])
    valid = np.asarray(out[4])
    np.testing.assert_array_equal(np.where(valid, ids, -1), live["ids"])
    np.testing.assert_array_equal(np.asarray(out[0]), live["joints"])


def test_aot_specs_honor_max_persons_override():
    """clip_arg_specs must use the tracker's EFFECTIVE person padding
    (ClipTracker(max_persons=...) overrides cfg.track.max_persons) —
    regression: specs built from the cfg value rejected production
    prepared args (caught by dryrun_multichip's AOT layout)."""
    from tests.test_clip_pipeline import StubFlow, StubPose, make_cfg
    from flowtrack_tpu.tracking.clip_pipeline import ClipTracker

    cfg = make_cfg()  # cfg.track.max_persons == 4
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {},
                          max_persons=2)
    specs = aot.clip_arg_specs(tracker, F, (H, W))
    frames = np.zeros((F, H, W, 3), np.float32)
    args = tracker.prepare(frames, np.zeros((F, 2, 4), np.float32),
                           np.zeros((F, 2), np.float32),
                           np.ones((F, 2), bool))
    for spec, arg in zip(specs[2:9], args):
        assert spec.shape == arg.shape, (spec.shape, arg.shape)
    import json
    meta = json.loads(aot.artifact_meta(tracker, F, (H, W), None, None))
    assert meta["max_persons"] == 2


def test_aot_rejects_wrong_shapes():
    """Shape-specialization is enforced at call time, not silently padded."""
    tracker = default_tracker()
    call = aot.load_clip_program(
        aot.export_clip_program(tracker, F, (H, W)))
    args = tracker.prepare(*_scenario(4))
    short = (args[0][: F - 1],) + args[1:]
    with pytest.raises(Exception):
        call(tracker.pose_vars, tracker.flow_vars, *short,
             *tracker.empty_seed())


@pytest.mark.slow
def test_export_program_cli(tmp_path, monkeypatch, capsys):
    """Real models end to end: CLI writes blob + sidecar, --check reloads
    and runs it on the current backend."""
    from flowtrack_tpu.config import ModelConfig
    from flowtrack_tpu.engine.checkpoint import save_npz_variables
    from flowtrack_tpu.models.flownet import FlowNetS
    from flowtrack_tpu.models.pose_resnet import get_pose_net

    mcfg = ModelConfig(num_layers=18, image_size=(64, 64),
                       heatmap_size=(16, 16), dtype="float32")
    pose = get_pose_net(mcfg)
    pv = jax.jit(pose.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    save_npz_variables(str(tmp_path / "pose.npz"), pv)
    flow = FlowNetS(dtype=jnp.float32)
    fv = jax.jit(flow.init, static_argnames="train")(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 6)), train=False)
    save_npz_variables(str(tmp_path / "flow.npz"), fv)

    from tools import export_program

    out = tmp_path / "clip_prog.bin"
    monkeypatch.setattr(sys, "argv", [
        "export_program.py", "--cfg", "flowtrack_posetrack",
        "--pose-weights", str(tmp_path / "pose.npz"),
        "--flow-weights", str(tmp_path / "flow.npz"),
        "--out", str(out), "--clip-len", "3", "--frame-size", "96x128",
        "--check",
        "model.num_layers=18", "model.image_size=64,64",
        "model.heatmap_size=16,16", "model.dtype=float32",
        "flow.dtype=float32",
    ])
    export_program.main()
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["checked"] is True
    assert out.exists() and out.stat().st_size == info["bytes"]
    meta = json.loads((tmp_path / "clip_prog.json").read_text())
    assert meta["clip_len"] == 3 and meta["frame_hw"] == [96, 128]
