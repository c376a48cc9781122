"""The full closed loop: train a real PoseResNet on the synthetic COCO
fixture until the COCO-AP validation (the reference's only correctness
check, SURVEY.md section 5) clears a threshold random weights cannot.

Exercises dataset -> loader -> train_step -> eval pipeline -> decode ->
rescore -> OKS-NMS -> AP evaluator as one system."""

from dataclasses import replace

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flowtrack_tpu.config import Config, ModelConfig, TestConfig, TrainConfig
from flowtrack_tpu.data import BatchLoader, COCODataset
from flowtrack_tpu.engine.train import create_train_state, make_jit_train_step
from flowtrack_tpu.models.pose_resnet import get_pose_net
from tests.fixtures import make_coco_fixture
from tools.test import run_validation

pytestmark = pytest.mark.slow


def test_training_lifts_ap(tmp_path):
    root, _, _ = make_coco_fixture(tmp_path, n_images=4, persons=2)
    cfg = Config(
        model=ModelConfig(num_layers=18, image_size=(64, 64),
                          heatmap_size=(16, 16), sigma=1.5, dtype="float32"),
        # aug off: we WANT overfitting of the 8 instances
        train=TrainConfig(batch_size=8, lr=2e-3, flip_prob=0.0,
                          rot_factor=0.0, scale_factor=0.0),
        test=TestConfig(batch_size=8, use_gt_bbox=True, flip_test=False),
    )
    cfg = replace(cfg, data=replace(cfg.data, root=root,
                                    test_set="val2017"))

    train_ds = COCODataset(cfg, root, "val2017", is_train=True)
    eval_ds = COCODataset(cfg, root, "val2017", is_train=False)
    model = get_pose_net(cfg.model)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)))
    step = make_jit_train_step(donate=False)

    def ap_now():
        stats = run_validation(
            cfg, model,
            {"params": state.params, "batch_stats": state.batch_stats},
            dataset=eval_ds)
        return stats["AP"]

    ap_before = ap_now()

    loader = BatchLoader(train_ds, 8, shuffle=True, seed=0)
    for epoch in range(60):
        for batch in loader:
            dev = {k: jnp.asarray(batch[k])
                   for k in ("input", "target", "target_weight")}
            state, m = step(state, dev)

    ap_after = ap_now()
    assert ap_after > max(0.3, ap_before + 0.25), \
        f"AP {ap_before:.3f} -> {ap_after:.3f} (loss {float(m['loss']):.5f})"
