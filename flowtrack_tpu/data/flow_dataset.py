"""Optical-flow pair datasets for FlowNet training and finetuning.

The reference repo consumes PRETRAINED FlowNet checkpoints; its upstream
lineage (NVIDIA/flownet2-pytorch ``datasets.py``) trains them from
image-pair + ``.flo`` corpora in two on-disk layouts:

  * FlyingChairs-style triplets: ``NNNNN_img1.ppm``, ``NNNNN_img2.ppm``,
    ``NNNNN_flow.flo`` in one directory;
  * MPI-Sintel-style sequences: a directory of ordered frames plus a
    directory of per-consecutive-pair ``.flo`` files.

This module provides the TPU-native equivalent feeding
``engine/flow_train.flow_train_step``: host-side numpy loading, the
lineage's geometric augmentation (random crop to a static /64-divisible
size + horizontal/vertical flips with the matching flow component sign
fixes), and static-shape batches — pair normalization
(``models/flownet.preprocess_pair``) runs on DEVICE inside the jitted
train step, so the host ships raw uint8/float frames only.
"""

from __future__ import annotations

import os
import re
from typing import List, Optional, Tuple

import numpy as np

from flowtrack_tpu.data.pose_dataset import load_image
from flowtrack_tpu.eval.flow_eval import read_flo

from flowtrack_tpu.utils.video import IMG_EXTS as _IMG_EXTS


def _discover_triplets(root: str) -> List[Tuple[str, str, str]]:
    """FlyingChairs layout: ``<id>_img1.<ext>`` / ``<id>_img2.<ext>`` /
    ``<id>_flow.flo`` triples in one directory."""
    img1 = {}
    for name in sorted(os.listdir(root)):
        m = re.match(r"(.+)_img1(\.[A-Za-z]+)$", name)
        if m and name.lower().endswith(_IMG_EXTS):
            img1[m.group(1)] = name
    triplets = []
    for key, name1 in img1.items():
        name2 = name1.replace("_img1", "_img2")
        flo = f"{key}_flow.flo"
        if (os.path.exists(os.path.join(root, name2))
                and os.path.exists(os.path.join(root, flo))):
            triplets.append((os.path.join(root, name1),
                             os.path.join(root, name2),
                             os.path.join(root, flo)))
    return triplets


def _discover_sequence(frames_dir: str,
                       flow_dir: str) -> List[Tuple[str, str, str]]:
    """Sintel layout: ordered frames + one .flo per consecutive pair."""
    frames = sorted(f for f in os.listdir(frames_dir)
                    if f.lower().endswith(_IMG_EXTS))
    flos = sorted(f for f in os.listdir(flow_dir) if f.endswith(".flo"))
    if len(flos) != len(frames) - 1:
        raise ValueError(
            f"{len(flos)} .flo files for {len(frames)} frames "
            f"(want n_frames - 1)")
    return [(os.path.join(frames_dir, frames[i]),
             os.path.join(frames_dir, frames[i + 1]),
             os.path.join(flow_dir, flos[i]))
            for i in range(len(flos))]


class FlowPairDataset:
    """(im1, im2, flow) samples from either on-disk layout.

    ``root``: triplet directory (FlyingChairs layout), OR pass
    ``frames_dir``/``flow_dir`` for the Sintel layout.

    Train-mode augmentation (reference lineage): random crop to
    ``crop_size`` (static shape for jit; must be /64-divisible for the
    FlowNet encoders) and random horizontal/vertical flips — a horizontal
    flip negates the flow's x component, a vertical flip its y component.
    """

    def __init__(self, root: Optional[str] = None,
                 frames_dir: Optional[str] = None,
                 flow_dir: Optional[str] = None,
                 crop_size: Optional[Tuple[int, int]] = None,
                 is_train: bool = False,
                 flip_prob: float = 0.5,
                 vflip_prob: float = 0.1):
        if root is not None:
            self.samples = _discover_triplets(root)
        elif frames_dir is not None and flow_dir is not None:
            self.samples = _discover_sequence(frames_dir, flow_dir)
        else:
            raise ValueError("pass root= (triplets) or frames_dir+flow_dir")
        if not self.samples:
            raise ValueError("no flow samples found")
        self.crop_size = crop_size
        self.is_train = is_train
        self.flip_prob = flip_prob
        self.vflip_prob = vflip_prob

    def __len__(self):
        return len(self.samples)

    def load_raw(self, i: int):
        p1, p2, pf = self.samples[i]
        im1 = load_image(p1).astype(np.float32)
        im2 = load_image(p2).astype(np.float32)
        flow = read_flo(pf)
        return im1, im2, flow

    def __getitem__(self, i: int, rng: Optional[np.random.Generator] = None):
        im1, im2, flow = self.load_raw(i)
        if self.crop_size is not None:
            ch, cw = self.crop_size
            h, w = im1.shape[:2]
            if h < ch or w < cw:
                raise ValueError(f"crop {self.crop_size} > image {(h, w)}")
            if self.is_train and rng is not None:
                y0 = int(rng.integers(0, h - ch + 1))
                x0 = int(rng.integers(0, w - cw + 1))
            else:  # deterministic center crop for eval
                y0, x0 = (h - ch) // 2, (w - cw) // 2
            im1 = im1[y0:y0 + ch, x0:x0 + cw]
            im2 = im2[y0:y0 + ch, x0:x0 + cw]
            flow = flow[y0:y0 + ch, x0:x0 + cw]
        if self.is_train and rng is not None:
            if rng.random() < self.flip_prob:      # horizontal
                im1 = im1[:, ::-1]
                im2 = im2[:, ::-1]
                flow = flow[:, ::-1] * np.array([-1.0, 1.0], np.float32)
            if rng.random() < self.vflip_prob:     # vertical
                im1 = im1[::-1]
                im2 = im2[::-1]
                flow = flow[::-1] * np.array([1.0, -1.0], np.float32)
        return (np.ascontiguousarray(im1), np.ascontiguousarray(im2),
                np.ascontiguousarray(flow, np.float32))


def flow_batches(dataset: FlowPairDataset, batch_size: int,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True):
    """Generator of static-shape batches {"im1", "im2", "flow", "n_real"}
    (numpy). The last short batch is PADDED by repeating samples when
    drop_last=False (flow training is loss-averaged; repeated samples only
    reweight, they never change shapes); ``n_real`` is the unpadded count
    so metric consumers (validation EPE) can exclude the duplicates."""
    rng = np.random.default_rng(seed)
    order = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(order)
    n = len(order)
    for start in range(0, n, batch_size):
        idx = order[start:start + batch_size]
        n_real = len(idx)
        if n_real < batch_size:
            if drop_last:
                return
            # cyclic tile: the shortfall may exceed the corpus (tiny
            # datasets on wide meshes)
            idx = np.concatenate(
                [idx, np.resize(order, batch_size - n_real)])
        im1s, im2s, flows = zip(*(dataset.__getitem__(int(i), rng=rng)
                                  for i in idx))
        yield {"im1": np.stack(im1s), "im2": np.stack(im2s),
               "flow": np.stack(flows), "n_real": n_real}
