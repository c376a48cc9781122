"""Device inference pipelines: PosePredictor + FlowPredictor.

The TPU-native replacement for the reference's per-person H2D/D2H round
trips (SURVEY.md section 4.4 boundaries): the full frame is resident on
device; crops, forward, flip-merge, decode and rescoring are ONE jit'd XLA
program with static shapes (persons padded to ``max_persons``). Only boxes
in / keypoints out cross the host boundary.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from flowtrack_tpu.config import (
    COCO_FLIP_PAIRS,
    IMAGENET_MEAN,
    IMAGENET_STD,
    PIXEL_STD,
    Config,
)
from flowtrack_tpu.models.flownet import (
    get_flow_net,
    postprocess_flow,
    preprocess_pair,
)
from flowtrack_tpu.models.pose_resnet import get_pose_net
from flowtrack_tpu.ops.crop import crop_resize_normalize
from flowtrack_tpu.ops.decode import get_final_preds, rescore
from flowtrack_tpu.ops.heatmap import merge_flip_test


def batched_box_to_center_scale(boxes_xywh: np.ndarray, aspect_ratio: float,
                                scale_padding: float = 1.25):
    """(P, 4) xywh -> centers (P, 2), scales (P, 2). Vectorized numpy twin
    of ops/affine.box_to_center_scale."""
    boxes = np.asarray(boxes_xywh, np.float64).reshape(-1, 4)
    x, y, w, h = boxes.T.copy()
    centers = np.stack([x + w * 0.5, y + h * 0.5], axis=1)
    wide = w > aspect_ratio * h
    h = np.where(wide, w / aspect_ratio, h)
    w = np.where(~wide & (w < aspect_ratio * h), h * aspect_ratio, w)
    scales = np.stack([w, h], axis=1) / PIXEL_STD * scale_padding
    return centers, scales


class PosePredictor:
    """image + person boxes -> keypoints, confidences, rescored scores."""

    def __init__(self, cfg: Config, variables, model=None,
                 max_persons: Optional[int] = None):
        self.cfg = cfg
        self.model = model if model is not None else get_pose_net(cfg.model)
        self.variables = variables
        self.max_persons = max_persons or cfg.track.max_persons
        img_h, img_w = cfg.model.image_size
        self.out_hw = (img_h, img_w)
        self.aspect_ratio = img_w / img_h

        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        flip_test = cfg.test.flip_test
        shift = cfg.test.shift_heatmap
        post = cfg.test.post_process
        vis_thre = cfg.test.in_vis_thre
        flip_pairs = COCO_FLIP_PAIRS

        def device_fn(variables, image, centers, scales, scores):
            # fused matmul crop+normalize (ops/crop.py): MXU work instead of
            # a gather-bound warp
            crops = crop_resize_normalize(image, centers, scales,
                                          self.out_hw, mean, std)
            if flip_test:
                both = jnp.concatenate([crops, crops[:, :, ::-1, :]], axis=0)
                hm = self.model.apply(variables, both, train=False)
                p = crops.shape[0]
                hm = merge_flip_test(hm[:p], hm[p:], flip_pairs, shift=shift)
            else:
                hm = self.model.apply(variables, crops, train=False)
            preds, maxvals = get_final_preds(
                hm, centers, scales, post_process=post,
                blur_kernel=cfg.test.blur_kernel)
            return preds, maxvals, rescore(scores, maxvals, vis_thre)

        # one jit object is enough: nothing shape-dependent is closed
        # over, and jax.jit caches per input shape internally (unlike
        # FlowPredictor, whose net_hw/out_hw ARE shape-derived closures)
        self._fn = jax.jit(device_fn)

    def __call__(self, image: np.ndarray, boxes_xywh: np.ndarray,
                 scores: np.ndarray):
        """image: (H, W, 3) RGB; boxes: (P, 4) xywh; scores: (P,).
        Returns (joints (P, K, 2), maxvals (P, K), rescored (P,)) numpy."""
        p = len(boxes_xywh)
        if p == 0:
            k = self.cfg.model.num_joints
            return (np.zeros((0, k, 2), np.float32),
                    np.zeros((0, k), np.float32),
                    np.zeros((0,), np.float32))
        centers, scales = batched_box_to_center_scale(
            boxes_xywh, self.aspect_ratio)
        # pad to the static person budget (repeat last, masked out after)
        pad = -(-p // self.max_persons) * self.max_persons - p
        centers = np.concatenate([centers, np.repeat(centers[-1:], pad, 0)])
        scales = np.concatenate([scales, np.repeat(scales[-1:], pad, 0)])
        sc = np.concatenate([np.asarray(scores, np.float64),
                             np.zeros(pad)])
        fn = self._fn
        preds, maxvals, rescored = fn(
            self.variables, jnp.asarray(image),
            jnp.asarray(centers, jnp.float32),
            jnp.asarray(scales, jnp.float32),
            jnp.asarray(sc, jnp.float32))
        return (np.asarray(preds)[:p], np.asarray(maxvals)[:p],
                np.asarray(rescored)[:p])


def _round_up(v, m):
    return -(-v // m) * m


class FlowPredictor:
    """frame pair -> full-resolution flow (H, W, 2) in source pixels.

    Frames are bilinearly resized to a /64 grid for the net (FlowNet
    requirement), and the output flow is resized back with component
    rescaling."""

    def __init__(self, cfg: Config, variables, model=None,
                 target_hw: Optional[Tuple[int, int]] = None):
        self.cfg = cfg
        self.model = model if model is not None else get_flow_net(cfg.flow)
        self.variables = variables
        self.div_flow = cfg.flow.div_flow
        self.rgb_max = cfg.flow.rgb_max
        self.target_hw = target_hw
        self._jitted = {}

        variant = cfg.flow.variant

        def device_fn(variables, im1, im2, net_hw, out_hw):
            x1 = jax.image.resize(im1.astype(jnp.float32),
                                  (net_hw[0], net_hw[1], 3), "bilinear")
            x2 = jax.image.resize(im2.astype(jnp.float32),
                                  (net_hw[0], net_hw[1], 3), "bilinear")
            x = preprocess_pair(x1[None], x2[None], self.rgb_max)
            flow_q = self.model.apply(variables, x, train=False)
            # handles both conventions: S/C/SD quarter-res flow/div_flow,
            # FlowNet2 full-res final flow (models/flownet.postprocess_flow)
            return postprocess_flow(flow_q, variant, out_hw,
                                    self.div_flow)[0]

        self._device_fn = device_fn

    def __call__(self, prev_image: np.ndarray, image: np.ndarray):
        h, w = image.shape[:2]
        if self.target_hw is not None:
            net_hw = self.target_hw
        else:
            net_hw = (_round_up(h, 64), _round_up(w, 64))
        key = (image.shape, net_hw)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                lambda v, a, b: self._device_fn(v, a, b, net_hw, (h, w)))
        return self._jitted[key](self.variables, jnp.asarray(prev_image),
                                 jnp.asarray(image))
