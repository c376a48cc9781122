"""tools/demo.py end-to-end: weights npz + image + boxes -> skeleton png."""

import json
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flowtrack_tpu.config import Config, ModelConfig
from flowtrack_tpu.engine.checkpoint import save_npz_variables
from flowtrack_tpu.models.pose_resnet import get_pose_net
from tests.fixtures import save_image


@pytest.mark.slow
def test_demo_main(tmp_path, rng, monkeypatch, capsys):
    cfg = Config(model=ModelConfig(num_layers=50, image_size=(64, 64),
                                   heatmap_size=(16, 16), dtype="float32"))
    model = get_pose_net(cfg.model)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    wpath = tmp_path / "w.npz"
    save_npz_variables(str(wpath), variables)

    img = rng.uniform(0, 255, (120, 160, 3)).astype(np.uint8)
    ipath = tmp_path / "img.png"
    save_image(str(ipath), img)
    bpath = tmp_path / "boxes.json"
    bpath.write_text(json.dumps([[30, 30, 40, 60], [90, 20, 40, 70]]))
    opath = tmp_path / "out.png"

    from tools import demo

    monkeypatch.setattr(sys, "argv", [
        "demo.py", "--weights", str(wpath), "--image", str(ipath),
        "--boxes", str(bpath), "--out", str(opath),
        "--cfg", "coco_res50_256x192",
        "model.image_size=64,64", "model.heatmap_size=16,16",
        "model.dtype=float32"])
    demo.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["persons"] == 2
    assert opath.exists()
