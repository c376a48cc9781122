"""PosePredictor / FlowPredictor / tools surface tests (tiny configs on the
CPU mesh; random weights — these pin the plumbing, parity is pinned by the
golden tests)."""

from dataclasses import replace

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flowtrack_tpu.config import Config, FlowConfig, ModelConfig
from flowtrack_tpu.models.flownet import FlowNetS
from flowtrack_tpu.models.pose_resnet import get_pose_net
from flowtrack_tpu.pipeline import (
    FlowPredictor,
    PosePredictor,
    batched_box_to_center_scale,
)

# plumbing-only config: ResNet-18 exercises the identical PosePredictor /
# run_validation code paths at a fraction of R50's CPU cost; R50 parity
# is pinned by test_pose_resnet_parity.py
TINY = Config(model=ModelConfig(num_layers=18, image_size=(64, 64),
                                heatmap_size=(16, 16), dtype="float32"))


def test_batched_box_to_center_scale_matches_single():
    from flowtrack_tpu.ops.affine import box_to_center_scale

    rng = np.random.default_rng(0)
    boxes = np.abs(rng.normal(50, 20, (5, 4))) + 1
    cb, sb = batched_box_to_center_scale(boxes, 0.75)
    for i in range(5):
        c, s = box_to_center_scale(boxes[i], 0.75)
        np.testing.assert_allclose(cb[i], c, rtol=1e-9)
        np.testing.assert_allclose(sb[i], s, rtol=1e-9)


@pytest.fixture(scope="module")
def pose_predictor():
    model = get_pose_net(TINY.model)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    return PosePredictor(TINY, variables, model=model, max_persons=4)


class TestPosePredictor:
    def test_shapes_and_padding(self, pose_predictor, rng):
        img = rng.uniform(0, 255, (120, 160, 3)).astype(np.float32)
        boxes = np.array([[20, 20, 40, 60], [80, 30, 40, 60],
                          [50, 50, 30, 50]], np.float32)
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        joints, maxvals, resc = pose_predictor(img, boxes, scores)
        assert joints.shape == (3, 17, 2)
        assert maxvals.shape == (3, 17)
        assert resc.shape == (3,)
        # keypoints land inside (or near) their source boxes
        for i, b in enumerate(boxes):
            cx = joints[i, :, 0].mean()
            assert b[0] - 30 < cx < b[0] + b[2] + 30

    def test_empty_boxes(self, pose_predictor, rng):
        img = rng.uniform(0, 255, (120, 160, 3)).astype(np.float32)
        joints, maxvals, resc = pose_predictor(
            img, np.zeros((0, 4), np.float32), np.zeros((0,), np.float32))
        assert joints.shape == (0, 17, 2)

    def test_padding_does_not_change_results(self, pose_predictor, rng):
        img = rng.uniform(0, 255, (120, 160, 3)).astype(np.float32)
        b1 = np.array([[20, 20, 40, 60]], np.float32)
        s1 = np.array([0.9], np.float32)
        j1, m1, _ = pose_predictor(img, b1, s1)
        b3 = np.array([[20, 20, 40, 60], [80, 30, 40, 60],
                       [50, 50, 30, 50]], np.float32)
        s3 = np.array([0.9, 0.8, 0.7], np.float32)
        j3, m3, _ = pose_predictor(img, b3, s3)
        np.testing.assert_allclose(j1[0], j3[0], atol=1e-3)


class TestFlowPredictor:
    @pytest.mark.slow
    def test_flow_shapes_and_rescale(self, rng):
        cfg = Config(flow=FlowConfig(variant="flownet_s", dtype="float32"))
        model = FlowNetS(dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 6)), train=False)
        pred = FlowPredictor(cfg, variables, model=model,
                             target_hw=(64, 64))
        a = rng.uniform(0, 255, (100, 140, 3)).astype(np.float32)
        b = rng.uniform(0, 255, (100, 140, 3)).astype(np.float32)
        flow = np.asarray(pred(a, b))
        assert flow.shape == (100, 140, 2)
        assert np.isfinite(flow).all()


class TestVisLogging:
    def test_draw_and_flow_color(self, rng, tmp_path):
        from flowtrack_tpu.utils.vis import (draw_skeleton, flow_to_color,
                                             heatmaps_to_grid, save_image)
        img = np.zeros((100, 100, 3), np.uint8)
        joints = rng.uniform(10, 90, (17, 2))
        draw_skeleton(img, joints, np.ones(17))
        assert img.sum() > 0
        flow = rng.normal(0, 3, (32, 32, 2)).astype(np.float32)
        col = flow_to_color(flow)
        assert col.shape == (32, 32, 3) and col.dtype == np.uint8
        grid = heatmaps_to_grid(rng.uniform(0, 1, (16, 12, 17)).astype(
            np.float32))
        assert grid.shape == (4 * 16, 5 * 12)
        save_image(str(tmp_path / "x.png"), img)

    def test_metrics_writer(self, tmp_path):
        import json

        from flowtrack_tpu.utils.logging import MetricsWriter
        w = MetricsWriter(str(tmp_path / "m.jsonl"))
        w.write(1, loss=0.5, acc=0.9)
        w.write(2, loss=0.4)
        w.close()
        lines = [json.loads(l) for l in
                 open(tmp_path / "m.jsonl").read().splitlines()]
        assert lines[0]["loss"] == 0.5 and lines[1]["step"] == 2


class TestRunValidation:
    def test_validation_pipeline_runs(self, tmp_path, rng):
        """tools/test.py run_validation on the synthetic fixture with a
        random model: the plumbing must produce a full AP table."""
        from tests.fixtures import make_coco_fixture
        from tools.test import run_validation

        root, _, det = make_coco_fixture(tmp_path)
        cfg = replace(TINY, test=replace(TINY.test, batch_size=2,
                                         bbox_file=det),
                      data=replace(TINY.data, root=root))
        from flowtrack_tpu.data import COCODataset

        ds = COCODataset(cfg, root, "val2017", is_train=False, bbox_file=det)
        model = get_pose_net(cfg.model)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False)
        stats = run_validation(cfg, model, variables, dataset=ds,
                               output_dir=str(tmp_path / "out"),
                               debug_dir=str(tmp_path / "dbg"))
        assert set(stats) >= {"AP", "AP50", "AR"}
        assert (tmp_path / "out" /
                "keypoints_val2017_results.json").exists()
        # the reference validate loop's save_debug_images twin: first
        # batch's crops with predicted skeletons + heatmap grids
        import os

        dumped = os.listdir(tmp_path / "dbg")
        assert any(f.endswith("_pred.png") for f in dumped), dumped
        assert any(f.endswith("_hm.png") for f in dumped), dumped
