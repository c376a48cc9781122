"""Coverage for small subsystems: native numpy fallback, device_prefetch,
logging file handler, engine.eval_step."""

import logging

import numpy as np
import jax
import jax.numpy as jnp


def test_native_numpy_fallback(monkeypatch, rng):
    """With the C++ lib unavailable, results must match the numpy oracle."""
    from flowtrack_tpu import native
    from flowtrack_tpu.ops.nms import nms_boxes_np, oks_nms_np

    monkeypatch.setattr(native, "_load", lambda: None)
    dets = np.concatenate([rng.uniform(0, 100, (20, 2)),
                           rng.uniform(0, 100, (20, 2)) + 120,
                           rng.uniform(0, 1, (20, 1))], axis=1)
    assert native.cpu_nms(dets, 0.5) == list(nms_boxes_np(dets, 0.5))

    kl = [{"keypoints": rng.uniform(0, 200, (17, 3)),
           "score": float(rng.uniform(0, 1)),
           "area": float(rng.uniform(100, 1000))} for _ in range(10)]
    assert native.cpu_oks_nms(kl, 0.9) == list(oks_nms_np(kl, 0.9))


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
    setup_logging(str(logf))
    logging.getLogger("flowtrack.test").info("hello-from-test")
    for h in logging.getLogger().handlers:
        h.flush()
    assert "hello-from-test" in logf.read_text()
    setup_logging()  # restore console-only


def test_engine_eval_step(rng):
    from dataclasses import replace

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
