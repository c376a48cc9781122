"""GT heatmap synthesis + flip-test merge.

Behavior contract (SURVEY.md section 3 "GT heatmap synthesis" / "Flip test"
rows; reference lineage: dataset ``generate_target`` + utils ``flip_back``):

  * One 2-D Gaussian per visible joint, centered at the joint quantized to
    the heatmap grid (mu = floor(x/stride + 0.5)), truncated at 3*sigma;
    joints whose 3-sigma box falls entirely outside the map get weight 0.
  * Flip test: run the model on the lr-flipped image, flip the heatmaps back,
    swap left/right channel pairs, shift one pixel right, average with the
    un-flipped heatmaps.

Layout: heatmaps are NHWK (channel-last) on device.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def generate_target_jax(joints, joints_vis, heatmap_hw, image_hw, sigma):
    """Vectorized GT heatmap synthesis.

    Args:
      joints: (K, 2) joint coords in INPUT-image pixels (x, y).
      joints_vis: (K,) visibility in {0, 1}.
      heatmap_hw: static (H, W) of the heatmap.
      image_hw: static (H, W) of the network input.
      sigma: gaussian sigma in heatmap pixels.

    Returns:
      target: (H, W, K) float32, peak value 1.
      target_weight: (K,) float32.
    """
    hm_h, hm_w = heatmap_hw
    stride_x = image_hw[1] / hm_w
    stride_y = image_hw[0] / hm_h
    tmp_size = int(sigma * 3)

    joints = jnp.asarray(joints, jnp.float32)
    vis = jnp.asarray(joints_vis, jnp.float32).reshape(-1)

    # int() in the reference truncates toward zero (matters for joints that
    # fall left/above the crop, where floor != trunc)
    mu_x = jnp.trunc(joints[:, 0] / stride_x + 0.5)  # (K,)
    mu_y = jnp.trunc(joints[:, 1] / stride_y + 0.5)

    # reference drops the joint if the truncated box misses the map entirely
    # reference checks br < 0 STRICTLY: a box exactly abutting the edge
    # (br == 0) keeps weight 1 with an empty pasted patch (advisor finding)
    outside = ((mu_x - tmp_size >= hm_w) | (mu_y - tmp_size >= hm_h)
               | (mu_x + tmp_size + 1 < 0) | (mu_y + tmp_size + 1 < 0))
    weight = vis * (1.0 - outside.astype(jnp.float32))

    ys = jax.lax.broadcasted_iota(jnp.float32, (hm_h, hm_w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (hm_h, hm_w), 1)
    dx = xs[None] - mu_x[:, None, None]          # (K, H, W)
    dy = ys[None] - mu_y[:, None, None]
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    # truncate beyond the 3-sigma box (reference pastes a (6s+1)^2 patch)
    inbox = (jnp.abs(dx) <= tmp_size) & (jnp.abs(dy) <= tmp_size)
    g = g * inbox.astype(jnp.float32) * weight[:, None, None]
    return jnp.transpose(g, (1, 2, 0)), weight


generate_target_batch = jax.vmap(generate_target_jax,
                                 in_axes=(0, 0, None, None, None))


def generate_target_np(joints, joints_vis, heatmap_hw, image_hw, sigma):
    """Pure-numpy twin (host data pipeline — no per-item jax dispatch).

    Kept algorithmically identical to generate_target_jax (tested equal)."""
    hm_h, hm_w = heatmap_hw
    stride_x = image_hw[1] / hm_w
    stride_y = image_hw[0] / hm_h
    tmp_size = int(sigma * 3)

    joints = np.asarray(joints, np.float32)
    vis = np.asarray(joints_vis, np.float32).reshape(-1)
    k = joints.shape[0]

    mu_x = np.trunc(joints[:, 0] / stride_x + 0.5)
    mu_y = np.trunc(joints[:, 1] / stride_y + 0.5)
    # reference checks br < 0 STRICTLY: a box exactly abutting the edge
    # (br == 0) keeps weight 1 with an empty pasted patch (advisor finding)
    outside = ((mu_x - tmp_size >= hm_w) | (mu_y - tmp_size >= hm_h)
               | (mu_x + tmp_size + 1 < 0) | (mu_y + tmp_size + 1 < 0))
    weight = vis * (1.0 - outside.astype(np.float32))

    ys = np.arange(hm_h, dtype=np.float32)[:, None]
    xs = np.arange(hm_w, dtype=np.float32)[None, :]
    target = np.zeros((hm_h, hm_w, k), np.float32)
    for j in range(k):
        if weight[j] <= 0:
            continue
        dx = xs - mu_x[j]
        dy = ys - mu_y[j]
        g = np.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
        g *= (np.abs(dx) <= tmp_size) & (np.abs(dy) <= tmp_size)
        target[:, :, j] = g
    return target, weight


def flip_back(heatmaps, flip_pairs):
    """Flip heatmaps back after flip-test forward. NHWK layout.

    Mirrors W, then swaps each (left, right) channel pair.
    """
    hm = heatmaps[:, :, ::-1, :]
    k = hm.shape[-1]
    perm = np.arange(k)
    for a, b in flip_pairs:
        perm[a], perm[b] = b, a
    # static per-channel slices + concat, NOT hm[..., perm]: a gather on
    # the minor (lane) axis measured 7.4% of the whole headline clip
    # program on v5e (device trace, STATUS round-4 item 11 follow-up);
    # the static form fuses away. Bitwise-identical (pure permutation).
    return jnp.concatenate([hm[..., int(p):int(p) + 1] for p in perm],
                           axis=-1)


def merge_flip_test(heatmaps, heatmaps_flipped, flip_pairs, shift=True):
    """Average direct + flipped-back heatmaps; optional 1-px right shift of
    the flipped map (reference: output_flipped[..., 1:] = output_flipped[..., :-1]
    in NCHW == shift along W)."""
    hf = flip_back(heatmaps_flipped, flip_pairs)
    if shift:
        hf = hf.at[:, :, 1:, :].set(hf[:, :, :-1, :])
    return (heatmaps + hf) * 0.5
