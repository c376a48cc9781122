"""End-to-end tracking GLUE parity: the production streaming FlowTracker
(PosePredictor + FlowPredictor + unified NMS + greedy OKS ids) against the
fully independent torch/numpy/cv2 loop in tests/oracles/tracker_torch.py,
on identical frames/detections/weights.

The per-component goldens pin each op; this pins their COMPOSITION — the
box->center/scale rule, crop semantics, decode+rescore, propagated-box
construction, the unified-NMS candidate set and the id assignment — in one
assertion. fp32 + Precision.HIGHEST configuration (the golden-parity mode).
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from dataclasses import replace

from flowtrack_tpu.config import Config, ModelConfig
from flowtrack_tpu.models.flownet import FlowNetS
from flowtrack_tpu.models.pose_resnet import get_pose_net
from flowtrack_tpu.pipeline import FlowPredictor, PosePredictor
from flowtrack_tpu.tracking.tracker import FlowTracker
from flowtrack_tpu.utils.torch_convert import (convert_flownet_s,
                                               convert_pose_resnet,
                                               state_dict_to_numpy)


@pytest.mark.slow
def test_streaming_tracker_matches_torch_oracle():
    from tests.oracles.flownet_torch import FlowNetSTorch, random_net
    from tests.oracles.pose_resnet_torch import random_pose_resnet
    from tests.oracles.tracker_torch import track_sequence_oracle

    rng = np.random.default_rng(3)
    pose_t = random_pose_resnet(50, seed=5)
    flow_t = random_net(FlowNetSTorch, seed=6)

    # smooth frames (low-frequency) keep bilinear-resampling differences
    # between cv2 and the matmul crop far below a pixel
    def smooth_frame(t):
        yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
        img = (127 + 80 * np.sin(xx / 9.0 + t) * np.cos(yy / 7.0 - 0.3 * t)
               + 40 * np.sin((xx + yy) / 11.0))
        return np.clip(np.stack([img, img * 0.8 + 20, 255 - img], -1),
                       0, 255).astype(np.float32)

    frames = [smooth_frame(t) for t in range(4)]
    # two persons moving; B's detection dropped at frame 2 (the propagated
    # box must keep it alive); a third appears at frame 3
    dets = []
    for t in range(4):
        boxes = [[8 + 2 * t, 10 + t, 24, 30]]
        scores = [0.9]
        if t != 2:
            boxes.append([30 + 2 * t, 20 + t, 22, 28])
            scores.append(0.8)
        if t == 3:
            boxes.append([4, 32, 20, 26])
            scores.append(0.7)
        dets.append((np.asarray(boxes, np.float32),
                     np.asarray(scores, np.float32)))

    # --- oracle loop (torch/cv2/numpy, fully independent)
    want = track_sequence_oracle(
        frames, dets, pose_t, flow_t, image_size=(64, 64),
        box_nms_thre=0.5, pose_score_thre=0.0, track_oks_thre=0.3)

    # --- production streaming tracker with converted weights
    cfg = Config(model=ModelConfig(num_layers=50, image_size=(64, 64),
                                   heatmap_size=(16, 16), dtype="float32"))
    cfg = replace(
        cfg,
        test=replace(cfg.test, flip_test=False),
        track=replace(cfg.track, box_nms_thre=0.5, pose_score_thre=0.0,
                      track_oks_thre=0.3, max_persons=4),
        flow=replace(cfg.flow, dtype="float32"))
    pose_vars = jax.tree.map(jnp.asarray, convert_pose_resnet(
        state_dict_to_numpy(pose_t.state_dict())))
    flow_vars = jax.tree.map(jnp.asarray, convert_flownet_s(
        state_dict_to_numpy(flow_t.state_dict())))
    pose_pred = PosePredictor(cfg, pose_vars)
    flow_pred = FlowPredictor(cfg, flow_vars,
                              model=FlowNetS(dtype=jnp.float32))
    tracker = FlowTracker(cfg, pose_pred, flow_pred)
    got = tracker.track_sequence(frames, dets)

    assert len(got) == len(want) == 4
    for t, (g_frame, w_frame) in enumerate(zip(got, want)):
        g_ids = [tr.track_id for tr in g_frame]
        w_ids = [tr["id"] for tr in w_frame]
        assert g_ids == w_ids, f"frame {t}: ids {g_ids} != oracle {w_ids}"
        for tr_g, tr_w in zip(g_frame, w_frame):
            err = np.abs(np.asarray(tr_g.joints) - tr_w["joints"]).max()
            assert err < 0.5, (t, tr_g.track_id, err)
            assert abs(tr_g.score - tr_w["score"]) < 1e-2

    # the scenario produced real work on both sides: candidates on every
    # frame, and the propagated boxes entered the frame>0 candidate sets
    # (id CONTINUITY under matching poses is pinned by the stub-model e2e
    # tests — random weights give noise poses whose OKS never matches, so
    # every frame legitimately mints fresh ids, identically on both sides)
    assert all(len(f) > 0 for f in want)
    assert len(want[1]) > len(dets[1][0])
