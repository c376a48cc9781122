"""export_weights CLI + jax.profiler trace smoke."""

import json
import os
import sys

import numpy as np
import torch
import jax.numpy as jnp

from flowtrack_tpu.utils import torch_convert as tc


def test_export_weights_cli(tmp_path, monkeypatch, capsys):
    from tests.oracles.flownet_torch import FlowNetSTorch, random_net

    oracle = random_net(FlowNetSTorch, seed=4)
    pth = tmp_path / "flow.pth"
    torch.save(oracle.state_dict(), pth)
    out = tmp_path / "flow.npz"

    from tools import export_weights

    monkeypatch.setattr(sys, "argv", [
        "export_weights.py", "--kind", "flownet_s", "--pth", str(pth),
        "--out", str(out)])
    export_weights.main()
    info = json.loads(capsys.readouterr().out.strip())
    assert info["num_params"] > 1e6
    assert out.exists()

    # the npz loads back into a working FlowNetS
    from flowtrack_tpu.engine.checkpoint import load_npz_variables
    from flowtrack_tpu.models.flownet import FlowNetS

    variables = load_npz_variables(str(out))
    model = FlowNetS(dtype=jnp.float32)
    flow = model.apply({"params": variables["params"]},
                       jnp.zeros((1, 64, 64, 6)), train=False)
    assert flow.shape == (1, 16, 16, 2)


def test_profiler_trace_writes(tmp_path):
    from flowtrack_tpu.utils.profiling import annotate, trace

    with trace(str(tmp_path)):
        with annotate("unit-test-span"):
            _ = jnp.ones((64, 64)).sum().block_until_ready()
    # a plugins/profile/<ts>/ tree with at least one trace artifact
    found = []
    for root, _, files in os.walk(tmp_path):
        found += [f for f in files if "trace" in f or f.endswith(".pb")]
    assert found, f"no trace artifacts under {tmp_path}"


def _strict_load(model, sd_np):
    model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd_np.items()}, strict=True)
    return model.eval()


def _assert_roundtrip(orig, rd):
    assert set(rd) == set(orig)
    for k in orig:
        np.testing.assert_array_equal(rd[k], orig[k], err_msg=k)


def test_reverse_pose_roundtrip():
    """torch -> flax -> torch must reproduce every array bitwise AND the
    result must strict-load into the torch model (no missing/renamed keys
    — the deploy-back-to-reference path)."""
    from tests.oracles.pose_resnet_torch import random_pose_resnet

    oracle = random_pose_resnet(50, seed=5)
    orig = tc.state_dict_to_numpy(oracle.state_dict())
    rd = tc.reverse_pose_resnet(tc.convert_pose_resnet(orig))
    _assert_roundtrip(orig, rd)
    _strict_load(random_pose_resnet(50, seed=6), rd)


def test_reverse_flownet_s_roundtrip():
    from tests.oracles.flownet_torch import FlowNetSTorch, random_net

    oracle = random_net(FlowNetSTorch, seed=7)
    orig = tc.state_dict_to_numpy(oracle.state_dict())
    rd = tc.reverse_flownet(tc.convert_flownet_s(orig))
    _assert_roundtrip(orig, rd)
    _strict_load(random_net(FlowNetSTorch, seed=8), rd)


def test_reverse_flownet2_roundtrip():
    from tests.oracles.flownet_torch import FlowNet2Torch, random_net

    oracle = random_net(FlowNet2Torch, seed=9)
    orig = tc.state_dict_to_numpy(oracle.state_dict())
    rd = tc.reverse_flownet2(tc.convert_flownet2(orig))
    _assert_roundtrip(orig, rd)
    _strict_load(random_net(FlowNet2Torch, seed=10), rd)


def test_export_weights_cli_reverse(tmp_path, monkeypatch, capsys):
    """--reverse writes a .pth that torch strict-loads with equal arrays."""
    from flowtrack_tpu.engine.checkpoint import save_npz_variables
    from tests.oracles.flownet_torch import FlowNetSTorch, random_net

    oracle = random_net(FlowNetSTorch, seed=11)
    orig = tc.state_dict_to_numpy(oracle.state_dict())
    npz = tmp_path / "flow.npz"
    save_npz_variables(str(npz), tc.convert_flownet_s(orig))

    from tools import export_weights

    pth = tmp_path / "flow_back.pth"
    monkeypatch.setattr(sys, "argv", [
        "export_weights.py", "--kind", "flownet_s", "--reverse",
        "--npz", str(npz), "--out", str(pth)])
    export_weights.main()
    info = json.loads(capsys.readouterr().out.strip())
    assert info["reverse"] and info["num_arrays"] == len(orig)
    back = {k: v.numpy() for k, v in
            torch.load(str(pth), weights_only=True).items()}
    _assert_roundtrip(orig, back)
    _strict_load(random_net(FlowNetSTorch, seed=12), back)
