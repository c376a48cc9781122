"""Coverage for small subsystems: native numpy fallback, device_prefetch,
logging file handler, engine.eval_step."""

import json
import logging
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_native_numpy_fallback(monkeypatch):
    """With the C++ lib unavailable, the fallback must produce the correct
    greedy result on a HAND-BUILT scenario (asserting against the numpy
    twin would be tautological — the fallback IS the numpy twin)."""
    from flowtrack_tpu import native

    monkeypatch.setattr(native, "_load", lambda: None)
    # box 1 overlaps box 0 heavily (suppressed), box 2 is disjoint
    dets = np.asarray([[0, 0, 10, 10, 0.9],
                       [1, 1, 11, 11, 0.8],
                       [50, 50, 60, 60, 0.7]], np.float32)
    assert native.cpu_nms(dets, 0.5) == [0, 2]

    kp_a = np.zeros((17, 3)); kp_a[:, 0] = 50; kp_a[:, 1] = 50; kp_a[:, 2] = 1
    kp_b = kp_a.copy()                      # identical pose -> OKS 1
    kp_c = kp_a.copy(); kp_c[:, :2] += 500  # far away -> OKS ~ 0
    kl = [{"keypoints": kp_a, "score": 0.9, "area": 400.0},
          {"keypoints": kp_b, "score": 0.8, "area": 400.0},
          {"keypoints": kp_c, "score": 0.7, "area": 400.0}]
    assert native.cpu_oks_nms(kl, 0.9) == [0, 2]


def test_device_prefetch_order(rng):
    from flowtrack_tpu.data.loader import device_prefetch

    batches = [{"input": np.full((2, 3), i, np.float32), "n_valid": 2}
               for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(np.asarray(b["input"])[0, 0]) == i
        assert b["n_valid"] == 2


def test_setup_logging_file(tmp_path):
    from flowtrack_tpu.utils.logging import setup_logging

    logf = tmp_path / "run.log"
    try:
        setup_logging(str(logf))
        logging.getLogger("flowtrack.test").info("hello-from-test")
        for h in logging.getLogger().handlers:
            h.flush()
        assert "hello-from-test" in logf.read_text()
    finally:
        setup_logging()  # restore console-only even if the assert fails


@pytest.mark.slow
def test_engine_eval_step(rng):
    from flax import linen as nn

    from flowtrack_tpu.config import COCO_FLIP_PAIRS, Config, ModelConfig
    from flowtrack_tpu.engine.train import eval_step

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=(4, 4), padding="SAME")(x)
            return nn.Conv(17, (1, 1))(x)

    cfg = Config(model=ModelConfig(image_size=(32, 24), heatmap_size=(8, 6)))
    model = Tiny()
    x = rng.normal(size=(3, 32, 24, 3)).astype(np.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    batch = {
        "input": jnp.asarray(x),
        "center": jnp.asarray(rng.uniform(40, 60, (3, 2)), jnp.float32),
        "scale": jnp.full((3, 2), 0.5, jnp.float32),
        "score": jnp.asarray([0.9, 0.8, 0.7], jnp.float32),
    }
    out = eval_step(model, variables, batch, cfg, COCO_FLIP_PAIRS)
    assert out["preds"].shape == (3, 17, 2)
    assert out["maxvals"].shape == (3, 17)
    assert out["scores"].shape == (3,)


def test_packaging_metadata_consistent():
    """pyproject.toml stays in lockstep with the package: version matches
    __version__, the native .cc source ships as package data (the lazy
    g++ build needs it in site-packages), and package discovery only picks
    up flowtrack_tpu (never tests/ or tools/)."""
    import tomllib
    import flowtrack_tpu

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    assert meta["project"]["version"] == flowtrack_tpu.__version__
    pkgdata = meta["tool"]["setuptools"]["package-data"]
    assert "*.cc" in pkgdata["flowtrack_tpu.native"]
    include = meta["tool"]["setuptools"]["packages"]["find"]["include"]
    assert include == ["flowtrack_tpu*"]

    from setuptools import find_packages
    found = find_packages(where=root, include=include)
    assert "flowtrack_tpu" in found
    assert all(p == "flowtrack_tpu" or p.startswith("flowtrack_tpu.")
               for p in found)


def test_bench_probe_backend(monkeypatch, capsys):
    """bench.probe_backend must fail FAST with a diagnostic JSON line when
    backend init hangs (the axon relay outage mode: jax.devices() blocking
    >10h would otherwise hang a driver-run bench), and must be a no-op for
    cpu runs / when explicitly disabled."""
    import subprocess

    import bench

    # explicit opt-out and cpu platform: no subprocess probe at all
    def boom(*a, **k):
        raise AssertionError("probe subprocess must not run")
    monkeypatch.setattr(subprocess, "run", boom)
    monkeypatch.setenv("BENCH_NO_PROBE", "1")
    bench.probe_backend()
    monkeypatch.delenv("BENCH_NO_PROBE")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    bench.probe_backend()

    # hung init -> one JSON line + exit code 2
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("BENCH_PROBE_TIMEOUT", "7")

    def hang(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, kw["timeout"])
    monkeypatch.setattr(subprocess, "run", hang)
    with pytest.raises(SystemExit) as exc:
        bench.probe_backend()
    assert exc.value.code == 2
    line = json.loads(capsys.readouterr().out.strip())
    assert line["value"] == 0.0 and "7s" in line["error"]

    # healthy init -> returns quietly
    class OK:
        returncode = 0
        stderr = ""
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: OK())
    bench.probe_backend()
    assert capsys.readouterr().out == ""
