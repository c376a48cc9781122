"""Zoo registry + eval_flow CLI end-to-end (synthetic frames + .flo GT)."""

import json
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flowtrack_tpu.zoo import ZOO, load_zoo_model


def test_zoo_covers_reference_checkpoints():
    names = set(ZOO)
    assert {"pose_resnet_50_256x192", "pose_resnet_152_384x288",
            "flownet_s", "flownet_c", "flownet2"} <= names
    for e in ZOO.values():
        assert e.reference_checkpoint


@pytest.mark.slow
def test_zoo_load_with_torch_sd():
    from tests.oracles.flownet_torch import FlowNetSTorch, random_net
    from flowtrack_tpu.utils.torch_convert import state_dict_to_numpy

    sd = state_dict_to_numpy(random_net(FlowNetSTorch, seed=2).state_dict())
    module, cfg, variables = load_zoo_model("flownet_s", torch_state_dict=sd)
    assert variables is not None
    out = module.apply(variables, jnp.zeros((1, 64, 64, 6)), train=False)
    assert out.shape == (1, 16, 16, 2)


def test_zoo_architecture_only():
    module, cfg, variables = load_zoo_model("pose_resnet_50_256x192")
    assert variables is None
    assert cfg.model.num_layers == 50


@pytest.mark.slow
def test_eval_flow_cli(tmp_path, monkeypatch, capsys, rng):
    from tests.fixtures import save_image
    from flowtrack_tpu.engine.checkpoint import save_npz_variables
    from flowtrack_tpu.eval.flow_eval import write_flo
    from flowtrack_tpu.models.flownet import FlowNetS

    frames_dir = tmp_path / "frames"
    flo_dir = tmp_path / "flo"
    frames_dir.mkdir()
    flo_dir.mkdir()
    for i in range(3):
        save_image(str(frames_dir / f"{i:03d}.png"),
                   rng.integers(0, 255, (64, 64, 3)).astype(np.uint8))
    for i in range(2):
        write_flo(str(flo_dir / f"{i:03d}.flo"),
                  np.zeros((64, 64, 2), np.float32))

    flow = FlowNetS(dtype=jnp.float32)
    fv = jax.jit(flow.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)), train=False)
    save_npz_variables(str(tmp_path / "w.npz"), fv)

    from tools import eval_flow

    monkeypatch.setattr(sys, "argv", [
        "eval_flow.py", "--weights", str(tmp_path / "w.npz"),
        "--frames", str(frames_dir), "--gt-flow", str(flo_dir),
        "flow.dtype=float32"])
    eval_flow.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["metric"] == "flow_epe"
    assert out["n_frames"] == 2
    assert np.isfinite(out["epe"])

    # pure inference mode (no GT): --save-flo dumps one .flo per pair
    # (+ color-wheel render), flownet2-pytorch inference-mode parity
    from flowtrack_tpu.eval.flow_eval import read_flo

    out_dir = tmp_path / "pred"
    monkeypatch.setattr(sys, "argv", [
        "eval_flow.py", "--weights", str(tmp_path / "w.npz"),
        "--frames", str(frames_dir), "--save-flo", str(out_dir),
        "--render", "flow.dtype=float32"])
    eval_flow.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["pairs"] == 2 and "epe" not in out
    pred = read_flo(str(out_dir / "000.flo"))
    assert pred.shape == (64, 64, 2) and np.isfinite(pred).all()
    assert (out_dir / "000.png").exists() and (out_dir / "001.flo").exists()
