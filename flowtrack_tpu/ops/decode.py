"""On-device heatmap -> keypoint decode.

Behavior contract (SURVEY.md section 3 "Heatmap decode" row, section 4.2;
reference lineage: core/inference.py ``get_max_preds`` / ``get_final_preds``
/ ``transform_preds``):

  1. per-joint argmax over the heatmap -> (x, y) + maxval confidence;
     coords are zeroed where maxval <= 0;
  2. quarter-pixel refinement: if the peak is strictly inside the border,
     shift 0.25 px toward the larger immediate neighbor in x and y;
  3. map heatmap coords back to source-image coords with the inverse crop
     affine (rot=0) built from (center, scale).

TPU-native: the whole decode is vmapped jnp — no host round-trip (the
reference pulls heatmaps to CPU per batch; SURVEY.md flags that as its big
eval-loop inefficiency). Layout NHWK.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flowtrack_tpu.ops.affine import affine_transform_jax, get_affine_transform_jax


def get_max_preds(heatmaps):
    """Argmax decode. heatmaps: (N, H, W, K) -> preds (N, K, 2) xy, maxvals (N, K)."""
    n, h, w, k = heatmaps.shape
    flat = heatmaps.reshape(n, h * w, k)
    idx = jnp.argmax(flat, axis=1)                      # (N, K)
    maxvals = jnp.max(flat, axis=1)                     # (N, K)
    px = (idx % w).astype(jnp.float32)
    py = (idx // w).astype(jnp.float32)
    preds = jnp.stack([px, py], axis=-1)                # (N, K, 2)
    mask = (maxvals > 0.0).astype(jnp.float32)[..., None]
    return preds * mask, maxvals


def _quarter_offset(heatmaps, preds):
    """+-0.25 px toward the larger neighbor (reference post_process)."""
    n, h, w, k = heatmaps.shape
    px = preds[..., 0].astype(jnp.int32)                # (N, K)
    py = preds[..., 1].astype(jnp.int32)

    def gather(hm, y, x):
        # hm: (H, W, K); y, x: (K,) -> (K,)
        yc = jnp.clip(y, 0, h - 1)
        xc = jnp.clip(x, 0, w - 1)
        return hm[yc, xc, jnp.arange(k)]

    gather_b = jax.vmap(gather)
    dx = gather_b(heatmaps, py, px + 1) - gather_b(heatmaps, py, px - 1)
    dy = gather_b(heatmaps, py + 1, px) - gather_b(heatmaps, py - 1, px)
    # reference gate is STRICT: 1 < p < size-1 (peaks AT 1 stay unshifted)
    inside = ((px > 1) & (px < w - 1) & (py > 1) & (py < h - 1))
    off = jnp.stack([jnp.sign(dx), jnp.sign(dy)], axis=-1) * 0.25
    return preds + off * inside[..., None].astype(jnp.float32)


def transform_preds_jax(coords, center, scale, heatmap_hw):
    """Heatmap coords -> source-image coords via inverse crop affine (rot=0).

    coords: (..., K, 2); center: (..., 2); scale: (..., 2).
    """
    hm_h, hm_w = heatmap_hw
    inv = get_affine_transform_jax(center, scale, 0.0, (hm_w, hm_h), inv=True)
    return affine_transform_jax(coords, inv)


def blur_heatmaps(heatmaps, kernel_size: int):
    """Gaussian-blur heatmaps before decode (the lineage's optional
    TEST.BLUR_KERNEL / DARK-style smoothing). Depthwise conv, sigma =
    0.3*((k-1)*0.5 - 1) + 0.8 (cv2.getGaussianKernel default); per-map peak
    value preserved (the reference rescales so max matches the original)."""
    if kernel_size <= 1:
        return heatmaps
    if kernel_size % 2 == 0:
        # the lineage's blur kernels are odd (cv2.GaussianBlur contract);
        # an even k with symmetric k//2 padding would silently emit
        # (H+1, W+1) maps and skew the inverse-affine decode
        raise ValueError(f"blur_kernel must be odd, got {kernel_size}")
    k = kernel_size
    sigma = 0.3 * ((k - 1) * 0.5 - 1) + 0.8
    x = jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2.0
    g1 = jnp.exp(-(x ** 2) / (2 * sigma * sigma))
    g1 = g1 / jnp.sum(g1)
    g2 = jnp.outer(g1, g1)                              # (k, k)
    nk = heatmaps.shape[-1]
    kernel = jnp.tile(g2[:, :, None, None], (1, 1, 1, nk))  # HWIO depthwise
    orig_max = jnp.max(heatmaps, axis=(1, 2), keepdims=True)
    blurred = jax.lax.conv_general_dilated(
        heatmaps, kernel, (1, 1),
        [(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=nk)
    new_max = jnp.max(blurred, axis=(1, 2), keepdims=True)
    return blurred * orig_max / jnp.maximum(new_max, 1e-12)


def get_final_preds(heatmaps, center, scale, post_process=True,
                    blur_kernel: int = 0):
    """Full decode: (N, H, W, K) heatmaps + per-person (center, scale)
    -> (N, K, 2) image-space keypoints + (N, K) maxvals. Pure jnp, jittable.
    """
    heatmaps = heatmaps.astype(jnp.float32)
    if blur_kernel and blur_kernel > 1:
        heatmaps = blur_heatmaps(heatmaps, blur_kernel)
    preds, maxvals = get_max_preds(heatmaps)
    if post_process:
        preds = _quarter_offset(heatmaps, preds)
    hm_h, hm_w = heatmaps.shape[1], heatmaps.shape[2]
    preds = transform_preds_jax(preds, center, scale, (hm_h, hm_w))
    return preds, maxvals


def rescore(box_scores, maxvals, in_vis_thre=0.2):
    """Reference rescoring: score = box_score * mean(maxvals over joints with
    maxval > in_vis_thre); 0 if no joint passes.

    box_scores: (N,); maxvals: (N, K) -> (N,).
    """
    vis = (maxvals > in_vis_thre).astype(jnp.float32)
    cnt = jnp.sum(vis, axis=-1)
    mean_conf = jnp.where(cnt > 0, jnp.sum(maxvals * vis, axis=-1) / jnp.maximum(cnt, 1.0), 0.0)
    return box_scores * mean_conf
