"""tools/track_video.py multi-stream mode: two videos through one batched
device program must produce EXACTLY the per-stream tracks.json of two
single-video runs (slow: real ResNet-18 + FlowNetS compile)."""

import json
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from tests.fixtures import save_image
    from flowtrack_tpu.engine.checkpoint import save_npz_variables
    from flowtrack_tpu.models.flownet import FlowNetS
    from flowtrack_tpu.models.pose_resnet import get_pose_net
    from flowtrack_tpu.config import ModelConfig

    tmp = tmp_path_factory.mktemp("tv_cli")
    rng = np.random.default_rng(0)
    vids = {}
    for vi, name in enumerate(("vid_a", "vid_b")):
        d = tmp / name
        d.mkdir()
        dets = []
        for t in range(5):
            img = rng.uniform(0, 120, (96, 128, 3)).astype(np.uint8)
            save_image(str(d / f"{t:04d}.png"), img)
            x = 20 + 8 * vi + 5 * t
            dets.append([{"bbox": [x, 30, 30, 40], "score": 0.9}])
        with open(tmp / f"{name}.json", "w") as f:
            json.dump(dets, f)
        vids[name] = (str(d), str(tmp / f"{name}.json"))

    mcfg = ModelConfig(num_layers=18, image_size=(64, 64),
                       heatmap_size=(16, 16), dtype="float32")
    pose = get_pose_net(mcfg)
    pv = jax.jit(pose.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    save_npz_variables(str(tmp / "pose.npz"), pv)
    flow = FlowNetS(dtype=jnp.float32)
    fv = jax.jit(flow.init, static_argnames="train")(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 6)), train=False)
    save_npz_variables(str(tmp / "flow.npz"), fv)
    return tmp, vids


def run_cli(tmp, monkeypatch, out, videos, detections):
    from tools import track_video

    monkeypatch.setattr(sys, "argv", [
        "track_video.py", "--cfg", "flowtrack_posetrack",
        "--pose-weights", str(tmp / "pose.npz"),
        "--flow-weights", str(tmp / "flow.npz"),
        "--video", *videos, "--detections", *detections,
        "--out", str(tmp / out), "--clip-len", "3",
        "model.num_layers=18", "model.image_size=64,64",
        "model.heatmap_size=16,16", "model.dtype=float32",
        "flow.dtype=float32", "track.pose_score_thre=0.0",
    ])
    track_video.main()


def test_multistream_cli_matches_single(setup, monkeypatch, capsys):
    tmp, vids = setup
    (va, da), (vb, db) = vids["vid_a"], vids["vid_b"]
    run_cli(tmp, monkeypatch, "single_a", [va], [da])
    run_cli(tmp, monkeypatch, "single_b", [vb], [db])
    run_cli(tmp, monkeypatch, "multi", [va, vb], [da, db])
    capsys.readouterr()

    for name, single in (("vid_a", "single_a"), ("vid_b", "single_b")):
        got = json.load(open(tmp / "multi" / name / "tracks.json"))
        want = json.load(open(tmp / single / "tracks.json"))
        assert len(got) == len(want) > 0, name
        for g, w in zip(got, want):
            assert g["frame"] == w["frame"] and \
                g["track_id"] == w["track_id"], name
            np.testing.assert_allclose(g["keypoints"], w["keypoints"],
                                       atol=1e-4, err_msg=name)
