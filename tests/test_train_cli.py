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
