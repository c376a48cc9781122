"""tools/track.py main() end-to-end on the synthetic PoseTrack fixture
(tiny config, random weights): sequences tracked, json written, stats
printed. Slow (jit compiles of the full pose+flow pipeline on CPU)."""

import json
import sys

import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


def test_track_main(tmp_path, monkeypatch, capsys):
    from tests.fixtures import make_posetrack_fixture
    from flowtrack_tpu.engine.checkpoint import save_npz_variables
    from flowtrack_tpu.models.flownet import FlowNetS
    from flowtrack_tpu.models.pose_resnet import get_pose_net
    from flowtrack_tpu.config import ModelConfig

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

    from tools import track

    monkeypatch.setattr(sys, "argv", [
        "track.py", "--cfg", "flowtrack_posetrack",
        "--pose-weights", str(tmp_path / "pose.npz"),
        "--flow-weights", str(tmp_path / "flow.npz"),
        "--out", str(tmp_path / "out"),
        "model.num_layers=18", "model.image_size=64,64",
        "model.heatmap_size=16,16", "model.dtype=float32",
        "flow.dtype=float32", "track.pose_score_thre=0.0",
        f"data.root={root}", "data.test_set=val",
    ])
    track.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "MOTA" in out and "mAP" in out
    tracks = json.load(open(tmp_path / "out" / "tracks.json"))
    assert len(tracks["annotations"]) > 0  # poses survived score gating
