"""Flow-pair dataset (data/flow_dataset.py): both on-disk layouts, crop +
flip augmentation with flow sign fixes, batching, and the train_flow CLI
end-to-end on a synthetic constant-flow corpus."""

import sys

import numpy as np
import pytest

from flowtrack_tpu.data.flow_dataset import (
    FlowPairDataset,
    flow_batches,
)
from flowtrack_tpu.eval.flow_eval import write_flo
from tests.fixtures import save_image


def _make_triplet_corpus(root, n=3, hw=(64, 96), flow_val=(4.0, -2.0)):
    rng = np.random.default_rng(0)
    h, w = hw
    for i in range(n):
        im = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        save_image(str(root / f"{i:05d}_img1.png"), im)
        save_image(str(root / f"{i:05d}_img2.png"),
                   np.roll(im, (1, 2), axis=(0, 1)))
        fl = np.zeros((h, w, 2), np.float32)
        fl[..., 0], fl[..., 1] = flow_val
        write_flo(str(root / f"{i:05d}_flow.flo"), fl)


class TestFlowPairDataset:
    def test_triplet_discovery_and_shapes(self, tmp_path):
        _make_triplet_corpus(tmp_path, n=3)
        ds = FlowPairDataset(root=str(tmp_path))
        assert len(ds) == 3
        im1, im2, fl = ds[0]
        assert im1.shape == (64, 96, 3) and fl.shape == (64, 96, 2)
        assert fl[0, 0, 0] == 4.0

    def test_sequence_layout(self, tmp_path):
        frames = tmp_path / "frames"
        flows = tmp_path / "flow"
        frames.mkdir()
        flows.mkdir()
        rng = np.random.default_rng(1)
        for t in range(4):
            save_image(str(frames / f"{t:03d}.png"),
                       rng.integers(0, 255, (64, 64, 3)).astype(np.uint8))
        for t in range(3):
            write_flo(str(flows / f"{t:03d}.flo"),
                      np.full((64, 64, 2), t, np.float32))
        ds = FlowPairDataset(frames_dir=str(frames), flow_dir=str(flows))
        assert len(ds) == 3
        _, _, fl = ds[2]
        assert (fl == 2).all()

    def test_mismatched_sequence_raises(self, tmp_path):
        # 3 frames need exactly 2 .flo files; give 1 so the COUNT-mismatch
        # guard itself raises (1 frame + 0 flos would pass that guard and
        # only trip the later empty-dataset error — review finding)
        frames = tmp_path / "frames"
        flows = tmp_path / "flow"
        frames.mkdir()
        flows.mkdir()
        for t in range(3):
            save_image(str(frames / f"{t}.png"),
                       np.zeros((8, 8, 3), np.uint8))
        write_flo(str(flows / "000.flo"), np.zeros((8, 8, 2), np.float32))
        with pytest.raises(ValueError, match="want n_frames"):
            FlowPairDataset(frames_dir=str(frames), flow_dir=str(flows))

    def test_center_crop_eval(self, tmp_path):
        _make_triplet_corpus(tmp_path, n=1, hw=(80, 112))
        ds = FlowPairDataset(root=str(tmp_path), crop_size=(64, 64),
                             is_train=False)
        im1, _, fl = ds[0]
        assert im1.shape == (64, 64, 3) and fl.shape == (64, 64, 2)

    def test_hflip_negates_x_component(self, tmp_path):
        _make_triplet_corpus(tmp_path, n=1)
        ds = FlowPairDataset(root=str(tmp_path), is_train=True,
                             flip_prob=1.0, vflip_prob=0.0)
        im1_raw, _, fl_raw = ds.load_raw(0)
        im1, _, fl = ds.__getitem__(0, rng=np.random.default_rng(0))
        np.testing.assert_array_equal(im1, im1_raw[:, ::-1])
        np.testing.assert_allclose(fl[..., 0], -fl_raw[:, ::-1][..., 0])
        np.testing.assert_allclose(fl[..., 1], fl_raw[:, ::-1][..., 1])

    def test_vflip_negates_y_component(self, tmp_path):
        _make_triplet_corpus(tmp_path, n=1)
        ds = FlowPairDataset(root=str(tmp_path), is_train=True,
                             flip_prob=0.0, vflip_prob=1.0)
        _, _, fl_raw = ds.load_raw(0)
        _, _, fl = ds.__getitem__(0, rng=np.random.default_rng(0))
        np.testing.assert_allclose(fl[..., 1], -fl_raw[::-1][..., 1])
        np.testing.assert_allclose(fl[..., 0], fl_raw[::-1][..., 0])

    def test_batches_pad_by_repeat(self, tmp_path):
        _make_triplet_corpus(tmp_path, n=3)
        ds = FlowPairDataset(root=str(tmp_path))
        bs = list(flow_batches(ds, 2, shuffle=False, drop_last=False))
        assert len(bs) == 2
        assert all(b["im1"].shape == (2, 64, 96, 3) for b in bs)
        assert all(b["flow"].dtype == np.float32 for b in bs)
        # ragged tail: n_real reports the unpadded count and the pad row
        # is the cyclic tile of the (unshuffled) order, i.e. sample 0 —
        # a zero-pad or wrong n_real would corrupt validation EPE
        assert bs[0]["n_real"] == 2 and bs[1]["n_real"] == 1
        im1_0, _, fl_0 = ds[0]
        np.testing.assert_array_equal(bs[1]["im1"][1], im1_0)
        np.testing.assert_array_equal(bs[1]["flow"][1], fl_0)
        # drop_last drops the ragged tail instead
        assert len(list(flow_batches(ds, 2, shuffle=False,
                                     drop_last=True))) == 1


@pytest.mark.slow
def test_train_flow_cli_overfits_constant_flow(tmp_path, monkeypatch):
    """tools/train_flow.py end-to-end: a tiny constant-flow corpus, a few
    epochs, weights saved and the trained net's EPE on the corpus beaten
    vs the random init (the flow twin of test_train_cli)."""
    import jax
    import jax.numpy as jnp

    from flowtrack_tpu.engine.checkpoint import load_npz_variables
    from flowtrack_tpu.models.flownet import (FlowNetS, flow_at_full_res,
                                              preprocess_pair)
    from tools import train_flow

    corpus = tmp_path / "chairs"
    corpus.mkdir()
    _make_triplet_corpus(corpus, n=4, hw=(64, 64), flow_val=(4.0, -2.0))
    out = tmp_path / "fn.npz"
    monkeypatch.setattr(sys, "argv", [
        "train_flow.py", "--cfg", "flownet_s", "--triplets", str(corpus),
        "--crop", "64", "64", "--batch", "1", "--epochs", "25",
        "--out", str(out), "flow.dtype=float32", "train.lr=1e-4",
    ])
    train_flow.main()
    assert out.exists()

    variables = jax.tree.map(jnp.asarray, load_npz_variables(str(out)))
    ds = FlowPairDataset(root=str(corpus))
    im1, im2, fl = ds[0]
    net = FlowNetS(dtype=jnp.float32)
    x = preprocess_pair(im1[None], im2[None])
    pred = flow_at_full_res(net.apply(variables, x, train=False))
    epe_trained = float(jnp.linalg.norm(
        pred[0] - fl, axis=-1).mean())
    init_vars = jax.jit(net.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    pred0 = flow_at_full_res(net.apply(init_vars, x, train=False))
    epe_init = float(jnp.linalg.norm(pred0[0] - fl, axis=-1).mean())
    assert epe_trained < 0.7 * epe_init, (epe_trained, epe_init)


@pytest.mark.slow
def test_train_flow_cli_ckpt_resume_and_val(tmp_path, monkeypatch, capsys):
    """--ckpt-dir/--resume/--val-* (flownet2-pytorch main.py parity):
    epoch checkpoints exist, val EPE is logged each epoch, and a resumed
    run continues from the saved epoch instead of restarting.

    Captured via capsys, not caplog: setup_logging uses basicConfig(
    force=True), which strips pytest's root capture handler; its
    StreamHandler binds the capsys-replaced sys.stdout instead."""
    import os

    from tools import train_flow

    corpus = tmp_path / "chairs"
    corpus.mkdir()
    _make_triplet_corpus(corpus, n=2, hw=(64, 64), flow_val=(2.0, 1.0))
    ckpt = tmp_path / "ckpt"
    argv = [
        "train_flow.py", "--cfg", "flownet_s", "--triplets", str(corpus),
        "--val-triplets", str(corpus),
        "--crop", "64", "64", "--batch", "1", "--epochs", "2",
        "--ckpt-dir", str(ckpt), "--out", str(tmp_path / "fn.npz"),
        "flow.dtype=float32", "train.lr=1e-5",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    train_flow.main()
    out = capsys.readouterr().out
    assert {"0", "1"} <= set(os.listdir(ckpt))
    assert out.count('"val_epe"') == 2  # one per epoch

    # resume: epochs=3 continues with exactly ONE new epoch (epoch 2)
    argv2 = list(argv)
    argv2[argv2.index("--epochs") + 1] = "3"
    monkeypatch.setattr(sys, "argv", argv2 + ["--resume"])
    train_flow.main()
    out = capsys.readouterr().out
    assert "resumed from epoch 1" in out
    epochs_run = [ln for ln in out.splitlines() if '"epoch"' in ln]
    assert len(epochs_run) == 1 and '"epoch": 2' in epochs_run[0]
