"""tools/track.py main() end-to-end on the synthetic PoseTrack fixture
(tiny config, random weights): sequences tracked, json written, stats
printed — for BOTH engines (streaming FlowTracker and the jit-batched
ClipTracker fast path), which must agree on the eval stats. Slow (jit
compiles of the full pose+flow pipeline on CPU)."""

import json
import sys

import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def cli_setup(tmp_path_factory):
    from tests.fixtures import make_posetrack_fixture
    from flowtrack_tpu.engine.checkpoint import save_npz_variables
    from flowtrack_tpu.models.flownet import FlowNetS
    from flowtrack_tpu.models.pose_resnet import get_pose_net
    from flowtrack_tpu.config import ModelConfig

    tmp_path = tmp_path_factory.mktemp("track_cli")
    root, _ = make_posetrack_fixture(tmp_path / "pt", n_videos=1,
                                     n_frames=3)
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
    return tmp_path, root


def run_cli(tmp_path, root, monkeypatch, out_dir, *extra):
    import contextlib
    import io

    from tools import track

    monkeypatch.setattr(sys, "argv", [
        "track.py", "--cfg", "flowtrack_posetrack",
        "--pose-weights", str(tmp_path / "pose.npz"),
        "--flow-weights", str(tmp_path / "flow.npz"),
        "--out", str(tmp_path / out_dir), *extra,
        "model.num_layers=18", "model.image_size=64,64",
        "model.heatmap_size=16,16", "model.dtype=float32",
        "flow.dtype=float32", "track.pose_score_thre=0.0",
        f"data.root={root}", "data.test_set=val",
    ])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        track.main()
    stats = json.loads(buf.getvalue().strip().splitlines()[-1])
    tracks = json.load(open(tmp_path / out_dir / "tracks.json"))
    return stats, tracks["annotations"]


@pytest.fixture(scope="module")
def stream_run(cli_setup):
    """ONE streaming-engine run shared by both tests (it jit-compiles the
    full pose+flow pipeline — the module's dominant cost)."""
    tmp_path, root = cli_setup
    mp = pytest.MonkeyPatch()
    try:
        return run_cli(tmp_path, root, mp, "out_s")
    finally:
        mp.undo()


def test_track_main(stream_run):
    stats, anns = stream_run
    assert "MOTA" in stats and "mAP" in stats
    assert len(anns) > 0  # poses survived score gating


def test_track_main_clip_engine_matches_stream(cli_setup, stream_run,
                                               monkeypatch):
    """--engine clip (ClipTracker over 2-frame clips, cross-clip seed
    carry active at the 1-frame overlaps) produces the same eval stats
    and per-frame pose count as the streaming engine on the same fixture
    and weights."""
    tmp_path, root = cli_setup
    stream, s_anns = stream_run
    clip, c_anns = run_cli(tmp_path, root, monkeypatch, "out_c",
                           "--engine", "clip", "--clip-len", "2")
    assert len(c_anns) == len(s_anns)
    for k in ("num_misses", "num_switches", "num_fps"):
        assert clip[k] == stream[k], k
    assert clip["MOTA"] == pytest.approx(stream["MOTA"], abs=1e-9)
    assert clip["mAP"] == pytest.approx(stream["mAP"], abs=1e-6)
