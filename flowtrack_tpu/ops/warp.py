"""Flow warping (resample2d) + channel norm — FlowNet2 glue ops.

Behavior contract (SURVEY.md section 3 "Resample2d (warp)" / "ChannelNorm"
rows; reference lineage: models/flownet/{resample2d,channelnorm}_package/
CUDA extensions — mount empty, semantics per FlowNet2, arXiv:1612.01925):

  * resample2d(img, flow): out(x, y) = bilinear sample of img at
    (x + u(x,y), y + v(x,y)); taps outside the image read the edge-clamped
    value (the CUDA kernel clamps sample coords to the valid range).
  * channelnorm(x): L2 norm across the channel dim (the "brightness error"
    input of the stacked nets).

TPU-native design: the reference's ~400-line CUDA resample2d becomes a
batched XLA gather (differentiable through both image and flow); channelnorm
is a one-line reduction — a kernel adds nothing on TPU (documented deliberate
downgrade, SURVEY.md section 3 native census item 3). Layout NHWC; flow is
(N, H, W, 2) with channel 0 = u (x displacement), channel 1 = v.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_sample_clamp(img, sx, sy):
    """Sample (H, W, C) at float coords with edge clamping (CUDA kernel
    semantics: coordinates are clamped to [0, W-1] x [0, H-1]).

    Formulated as ONE 2x2-neighborhood slice gather instead of four point
    gathers (exact same values; ~25% faster on the chip — the warp is the
    FlowNet2 cascade's dominant cost at ~1.5ms/image, gather-rate-bound).
    The corner anchor is clamped to (H-2, W-2) with the fractional weights
    recomputed against it, which reproduces the edge-clamped bilinear value
    exactly for coords in-range (at sy = H-1 the anchor is H-2 with
    wy = 1, i.e. full weight on the bottom row)."""
    h, w = img.shape[0], img.shape[1]
    c = img.shape[2]
    if h < 2 or w < 2:
        # degenerate fields: a (2,2) slice would exceed the operand; the
        # clamped sample is just the single row/col value
        sx = jnp.clip(sx, 0.0, w - 1.0)
        sy = jnp.clip(sy, 0.0, h - 1.0)
        if h == 1 and w == 1:
            return jnp.broadcast_to(img[0, 0], sx.shape + (c,))
        if h == 1:
            # single row: 1-D bilinear along x
            x0 = jnp.minimum(jnp.floor(sx), w - 2.0)
            wx = (sx - x0)[..., None].astype(img.dtype)
            xi = x0.astype(jnp.int32)
            row = img[0]
            return row[xi] * (1 - wx) + row[xi + 1] * wx
        # single column: 1-D bilinear along y
        y0 = jnp.minimum(jnp.floor(sy), h - 2.0)
        wy = (sy - y0)[..., None].astype(img.dtype)
        yi = y0.astype(jnp.int32)
        col = img[:, 0]
        return col[yi] * (1 - wy) + col[yi + 1] * wy
    sx = jnp.clip(sx, 0.0, w - 1.0)
    sy = jnp.clip(sy, 0.0, h - 1.0)
    x0 = jnp.minimum(jnp.floor(sx), w - 2.0)
    y0 = jnp.minimum(jnp.floor(sy), h - 2.0)
    wx = (sx - x0)[..., None].astype(img.dtype)
    wy = (sy - y0)[..., None].astype(img.dtype)

    starts = jnp.stack([y0.reshape(-1), x0.reshape(-1)],
                       axis=1).astype(jnp.int32)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    nb = jax.lax.gather(img, starts, dnums, slice_sizes=(2, 2, c),
                        mode="clip")                 # (H*W, 2, 2, C)
    nb = nb.reshape(sx.shape + (2, 2, c))
    one = jnp.asarray(1.0, img.dtype)
    top = nb[..., 0, 0, :] * (one - wx) + nb[..., 0, 1, :] * wx
    bot = nb[..., 1, 0, :] * (one - wx) + nb[..., 1, 1, :] * wx
    return top * (one - wy) + bot * wy


def resample2d(img, flow):
    """Warp img by flow. img: (N, H, W, C); flow: (N, H, W, 2) -> (N, H, W, C).

    out[n, y, x] = img[n] sampled at (x + flow[n,y,x,0], y + flow[n,y,x,1]).
    """
    n, h, w, _ = flow.shape

    def one(im, fl):
        ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        return _bilinear_sample_clamp(
            im, xs + fl[..., 0].astype(jnp.float32),
            ys + fl[..., 1].astype(jnp.float32))

    return jax.vmap(one)(img, flow)


def channelnorm(x, eps: float = 0.0):
    """L2 norm across channels: (N, H, W, C) -> (N, H, W, 1)."""
    return jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                            keepdims=True) + eps)


def _bilinear_sample_points(img, sx, sy):
    """Four-point-gather bilinear sample — same values as
    _bilinear_sample_clamp, but cheaper for SPARSE point sets: the
    (2,2,C)-slice gather's fixed cost dominates at a few dozen points, and
    flow_gather runs inside the tracker's sequential per-frame scans where
    that overhead multiplies (measured: switching the scans to the slice
    form cost ~12% end-to-end clip throughput)."""
    h, w = img.shape[0], img.shape[1]
    sx = jnp.clip(sx, 0.0, w - 1.0)
    sy = jnp.clip(sy, 0.0, h - 1.0)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None].astype(img.dtype)
    wy = (sy - y0)[..., None].astype(img.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    one = jnp.asarray(1.0, img.dtype)
    top = v00 * (one - wx) + v01 * wx
    bot = v10 * (one - wx) + v11 * wx
    return top * (one - wy) + bot * wy


def flow_gather(flow, pts_xy):
    """Sample a flow field at sparse points — the tracker's joint propagation
    primitive (SURVEY.md section 3 "Flow propagation": joints' = joints +
    flow[joint], bilinear).

    flow: (H, W, 2); pts_xy: (..., 2) -> (..., 2) flow vectors (edge-clamped).
    """
    return _bilinear_sample_points(flow, pts_xy[..., 0], pts_xy[..., 1])
