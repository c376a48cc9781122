"""export_weights CLI + jax.profiler trace smoke."""

import json
import os
import sys

import torch
import jax.numpy as jnp


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
