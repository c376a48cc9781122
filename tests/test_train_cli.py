"""tools/train.py main() end-to-end on the synthetic COCO fixture:
one epoch of real training + per-epoch validation + checkpoint save."""

import os
import sys

import pytest

pytestmark = pytest.mark.slow


def test_train_main_one_epoch(tmp_path, monkeypatch):
    from tests.fixtures import make_coco_fixture

    root, _, det = make_coco_fixture(tmp_path / "coco")
    out_dir = str(tmp_path / "ckpt")

    from tools import train

    monkeypatch.setattr(sys, "argv", [
        "train.py", "--cfg", "coco_res50_256x192", "--out", out_dir,
        "model.num_layers=18", "model.image_size=64,64",
        "model.heatmap_size=16,16", "model.dtype=float32",
        "train.batch_size=1", "train.end_epoch=1", "train.print_freq=1",
        "test.batch_size=1", "test.use_gt_bbox=true",
        f"data.root={root}", "data.train_set=val2017",
    ])
    train.main()
    # a checkpoint directory for epoch 0 must exist
    assert any(p.isdigit() for p in os.listdir(out_dir)), \
        os.listdir(out_dir)
    # per-epoch scalar metrics land in the checkpoint dir (jsonl; the
    # reference's tensorboard-scalars counterpart, SURVEY.md 6.5)
    import json

    lines = [json.loads(ln) for ln in
             open(os.path.join(out_dir, "metrics.jsonl"))]
    assert len(lines) == 1
    assert {"step", "train_loss", "train_acc", "val_perf",
            "lr"} <= set(lines[0])


def test_train_main_posetrack_finetune(tmp_path, monkeypatch):
    """The reference's FlowTrack recipe: warm-start the pose model
    (--init-weights, here a fresh init saved to .npz standing in for the
    COCO-trained weights) and fine-tune on PoseTrack frames for one epoch
    — the warm-started backbone must actually be loaded (asserted via the
    first logged loss matching a direct forward) and a checkpoint saved."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tests.fixtures import make_posetrack_fixture
    from flowtrack_tpu.config import ModelConfig
    from flowtrack_tpu.engine.checkpoint import save_npz_variables
    from flowtrack_tpu.models.pose_resnet import get_pose_net

    # 1 video x 4 frames x 2 persons = 8 samples = one full global batch
    # on the 8-device test mesh (batch_size=1 each; drop_last would
    # otherwise leave zero steps)
    root, _ = make_posetrack_fixture(tmp_path / "pt", n_videos=1,
                                     n_frames=4)
    mcfg = ModelConfig(num_layers=18, image_size=(64, 64),
                       heatmap_size=(16, 16), dtype="float32")
    pose = get_pose_net(mcfg)
    pv = jax.jit(pose.init, static_argnames="train")(
        jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)), train=False)
    save_npz_variables(str(tmp_path / "init.npz"), pv)
    out_dir = str(tmp_path / "ckpt")

    from tools import train

    # spy on create_train_state to assert the warm start actually reaches
    # the train state (a vacuous roundtrip check would pass even if
    # --init-weights were ignored — review finding)
    seen = {}
    orig_cts = train.create_train_state

    def spy(model, cfg, rng, sample, steps_per_epoch=1, variables=None):
        # snapshot to numpy NOW: the donated train step deletes these
        # buffers once training starts
        seen["conv1"] = (None if variables is None else np.asarray(
            variables["params"]["backbone"]["conv1"]["kernel"]))
        return orig_cts(model, cfg, rng, sample, steps_per_epoch,
                        variables=variables)

    monkeypatch.setattr(train, "create_train_state", spy)
    monkeypatch.setattr(sys, "argv", [
        "train.py", "--cfg", "flowtrack_posetrack", "--out", out_dir,
        "--init-weights", str(tmp_path / "init.npz"),
        "model.num_layers=18", "model.image_size=64,64",
        "model.heatmap_size=16,16", "model.dtype=float32",
        "train.batch_size=1", "train.end_epoch=1", "train.print_freq=1",
        "test.batch_size=1", "test.use_gt_bbox=true",
        f"data.root={root}", "data.train_set=val", "data.test_set=val",
    ])
    train.main()
    assert any(p.isdigit() for p in os.listdir(out_dir)), \
        os.listdir(out_dir)
    assert seen["conv1"] is not None
    np.testing.assert_array_equal(
        seen["conv1"],
        np.asarray(pv["params"]["backbone"]["conv1"]["kernel"]))


def test_initial_variables_backbone_npz(tmp_path):
    """--imagenet-backbone with a pre-converted .npz overlays the backbone
    and keeps the fresh head (unit: no training loop)."""
    import argparse

    import numpy as np
    import jax
    import jax.numpy as jnp
    import torch

    from flowtrack_tpu.config import Config, ModelConfig
    from flowtrack_tpu.engine.checkpoint import save_npz_variables
    from flowtrack_tpu.models.pose_resnet import get_pose_net
    from flowtrack_tpu.utils import torch_convert as tc
    from tests.oracles.pose_resnet_torch import random_pose_resnet
    from tools.train import initial_variables

    cfg = Config(model=ModelConfig(num_layers=50, image_size=(64, 64),
                                   heatmap_size=(16, 16), dtype="float32"))
    model = get_pose_net(cfg.model)
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)

    oracle = random_pose_resnet(50, seed=7)
    sd = {k: v for k, v in
          tc.state_dict_to_numpy(oracle.state_dict()).items()
          if not k.startswith(("deconv_layers", "final_layer"))}
    conv = tc.convert_resnet_backbone(sd)
    save_npz_variables(str(tmp_path / "bb.npz"), conv)

    args = argparse.Namespace(init_weights=None,
                              imagenet_backbone=str(tmp_path / "bb.npz"))
    v = initial_variables(args, model, cfg, sample)
    got = np.asarray(v["params"]["backbone"]["conv1"]["kernel"])
    want = np.asarray(conv["params"]["backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(got, want)
    # head stays at the fresh random init (shape sanity: 17ch 1x1)
    assert v["params"]["final"]["kernel"].shape[-1] == 17
