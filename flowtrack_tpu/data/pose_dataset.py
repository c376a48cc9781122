"""Shared top-down pose dataset: crop pipeline + train augmentation.

Behavior contract (SURVEY.md section 3 "COCO dataset" row; reference
lineage: the JointsDataset base of datasets/*.py):

  * item = one person instance: (image_path, center, scale, joints (K, 2),
    joints_vis (K,), score).
  * train aug: scale jitter s *= clip(randn*sf + 1, 1-sf, 1+sf) (sf=0.3);
    rotation r = clip(randn*rf, -2rf, 2rf) with prob 0.6 else 0 (rf=40);
    horizontal flip with prob 0.5 (image mirrored, joints swapped via
    flip_pairs, center reflected).
  * crop: get_affine_transform(center, scale, r, image_size) +
    cv2.warpAffine; joint coords mapped through the same transform.
  * normalize (x/255 - mean)/std; GT target = per-joint Gaussian heatmaps
    (ops/heatmap.generate_target_np) with visibility weights.

Host-side by design: augmentation randomness and jpeg decode stay on CPU;
the device sees dense normalized batches (the TPU-native split of the
reference's DataLoader worker stage, SURVEY.md section 4.1).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from flowtrack_tpu.config import (
    Config,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from flowtrack_tpu.ops.affine import (
    affine_transform,
    fliplr_joints,
    get_affine_transform,
)
from flowtrack_tpu.ops.heatmap import generate_target_np


def load_image(path: str) -> np.ndarray:
    """RGB uint8 (H, W, 3). cv2 if available, PIL fallback."""
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except ImportError:  # pragma: no cover
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))


def warp_image(img: np.ndarray, trans: np.ndarray, out_wh) -> np.ndarray:
    """cv2.warpAffine (bilinear, constant-0 border); numpy fallback."""
    try:
        import cv2

        return cv2.warpAffine(img, trans[:2].astype(np.float64),
                              (int(out_wh[0]), int(out_wh[1])),
                              flags=cv2.INTER_LINEAR)
    except ImportError:  # pragma: no cover
        import jax.numpy as jnp

        from flowtrack_tpu.ops.affine import warp_affine

        return np.asarray(warp_affine(jnp.asarray(img, jnp.float32), trans,
                                      (int(out_wh[1]), int(out_wh[0]))))


class PoseDataset:
    """Base class. Subclasses fill self.db (list of record dicts) and
    define num_joints / flip_pairs / evaluate()."""

    num_joints: int = 17
    flip_pairs = ()

    def __init__(self, cfg: Config, root: str, image_set: str,
                 is_train: bool, seed: Optional[int] = None):
        self.cfg = cfg
        self.root = root
        self.image_set = image_set
        self.is_train = is_train
        self.image_size = np.array(
            [cfg.model.image_size[1], cfg.model.image_size[0]])  # (w, h)
        self.heatmap_size = np.array(
            [cfg.model.heatmap_size[1], cfg.model.heatmap_size[0]])
        self.sigma = cfg.model.sigma
        self.aspect_ratio = self.image_size[0] / self.image_size[1]
        self.mean = np.array(IMAGENET_MEAN, np.float32)
        self.std = np.array(IMAGENET_STD, np.float32)
        self._seed = seed if seed is not None else cfg.train.seed
        self._epoch = 0
        self.db: List[dict] = []

    def set_epoch(self, epoch: int):
        """Advance the augmentation stream (called by BatchLoader per epoch
        so each epoch draws fresh, still-reproducible augmentations)."""
        self._epoch = int(epoch)

    def __len__(self):
        return len(self.db)

    # -- augmentation ------------------------------------------------------

    def _augment(self, rng, center, scale):
        sf = self.cfg.train.scale_factor
        rf = self.cfg.train.rot_factor
        scale = scale * np.clip(rng.normal() * sf + 1, 1 - sf, 1 + sf)
        rot = (np.clip(rng.normal() * rf, -rf * 2, rf * 2)
               if rng.random() <= 0.6 else 0.0)
        return scale, rot

    def __getitem__(self, idx: int):
        rec = self.db[idx]
        img = load_image(os.path.join(self.root, rec["image"]))
        joints = np.array(rec["joints"], np.float64).reshape(-1, 2).copy()
        joints_vis = np.array(rec["joints_vis"], np.float64).reshape(-1).copy()
        c = np.array(rec["center"], np.float64).copy()
        s = np.array(rec["scale"], np.float64).copy()
        score = rec.get("score", 1.0)
        r = 0.0

        if self.is_train:
            # Per-item Generator seeded by (seed, epoch, idx): thread-safe
            # under BatchLoader's worker pool (a shared np Generator is NOT;
            # concurrent draws corrupt its state) and reproducible
            # independent of worker scheduling.
            rng = np.random.default_rng((self._seed, self._epoch, idx))
            s, r = self._augment(rng, c, s)
            if rng.random() <= self.cfg.train.flip_prob:
                img = img[:, ::-1, :]
                joints, joints_vis = fliplr_joints(
                    joints, joints_vis, img.shape[1], self.flip_pairs)
                c[0] = img.shape[1] - c[0] - 1

        trans = get_affine_transform(c, s, r, self.image_size)
        inp = warp_image(img, trans, self.image_size).astype(np.float32)
        inp = (inp / 255.0 - self.mean) / self.std

        for j in range(self.num_joints):
            if joints_vis[j] > 0:
                joints[j] = affine_transform(joints[j], trans)

        target, target_weight = generate_target_np(
            joints, joints_vis,
            (int(self.heatmap_size[1]), int(self.heatmap_size[0])),
            (int(self.image_size[1]), int(self.image_size[0])),
            self.sigma)

        meta = {
            "image_id": rec.get("image_id", idx),
            "center": c.astype(np.float32),
            "scale": s.astype(np.float32),
            "rotation": np.float32(r),
            "score": np.float32(score),
            "joints": joints.astype(np.float32),
            "joints_vis": joints_vis.astype(np.float32),
        }
        return {
            "input": inp,
            "target": target,
            "target_weight": target_weight.astype(np.float32),
            **meta,
        }
