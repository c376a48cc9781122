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

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def resample2d(img, flow, use_pallas: bool = False, interpret: bool = False,
               matmul: bool = False):
    """Warp img by flow. img: (N, H, W, C); flow: (N, H, W, 2) -> (N, H, W, C).

    out[n, y, x] = img[n] sampled at (x + flow[n,y,x,0], y + flow[n,y,x,1]).

    ``use_pallas`` routes the dense warp through a Pallas kernel —
    ``matmul=False``: the shift-accumulate kernel (value-exact vs this
    XLA path); ``matmul=True``: the MXU matmul kernel (f32-contraction,
    ~1 ulp of the XLA path). Both differentiable via a custom VJP that
    reuses the XLA formulation's gradient, the same policy as
    ops/correlation.py. Falls back to XLA for degenerate fields and
    images too large for the kernel's VMEM-resident layout.
    """
    if use_pallas and _pallas_warp_supported(img):
        return _resample2d_pallas_diff(img, flow, interpret, matmul)
    n, h, w, _ = flow.shape

    def one(im, fl):
        ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        return _bilinear_sample_clamp(
            im, xs + fl[..., 0].astype(jnp.float32),
            ys + fl[..., 1].astype(jnp.float32))

    return jax.vmap(one)(img, flow)


# ---------------------------------------------------------------------------
# Pallas dense-warp kernel (SURVEY.md section 3 "Resample2d (warp)" row:
# "Pallas/XLA warp kernel [B]" — the XLA slice-gather above shipped first;
# this is the kernel variant, built because the FlowNet2 cascade's four
# dense warps are its documented ceiling: XLA's gather rate ~0.4G fetches/s
# on this chip, ~1.5 ms/image at 384x288.)
#
# Design: a gather has no native TPU primitive, so the kernel reformulates
# bilinear sampling as a SHIFT-ACCUMULATE over the integer displacement
# range actually present in each row block:
#
#   out[y, x] = sum_{dy, dx} w_y(y, x, dy) * w_x(y, x, dx) * img[y+dy, x+dx]
#
# where w_y/w_x are the 2-tap anchored bilinear weights (nonzero only at
# the anchor and anchor+1, computed exactly as the XLA path computes them,
# so results are value-exact). Per row block the kernel reduces the (dy,
# dx) loop to the block's own [min, max] anchor-offset ranges — smooth
# flow fields (the cascade's regime: consecutive-video-frame flow) need
# only a handful of passes, each a full-width VPU multiply-add:
#
#   * dy: a dynamic-start slice of the row-padded, VMEM-resident image —
#     legal because H is an UNTILED leading dim in the kernel's (H, C, W)
#     layout (Mosaic rule, same as ops/correlation.py's halo walk);
#   * dx: pltpu.roll (lane rotate) with a dynamic shift; circularly
#     wrapped lanes land on zero weights (coords are edge-clamped, so a
#     nonzero-weight tap is always in-bounds).
#
# The (H, C, W) layout keeps W on the 128-lane axis (full use); C=3 rides
# the sublanes at 3/8 occupancy — the price of keeping dynamic dy slices
# on an untiled dim. The whole image lives in VMEM (a few MB at cascade
# resolutions); oversized images fall back to the XLA path.
# ---------------------------------------------------------------------------

# Mosaic's scoped-vmem stack limit, measured on-chip 2026-08-19: compiling
# the kernel at wp=640 (which a 32 MB cap admitted) failed with "Scoped
# allocation with size 24.90M and limit 16.00M exceeded" — the per-step
# stack budget is 16 MB, not the 128 MB VMEM total. The byte estimate
# below OVERSHOOTS the compiler's real stack figure (31.9 MB estimated at
# the failing wp=640 vs 24.9 MB real), so estimate <= 16 MB is a sound
# admit rule; the largest admitted class (wp=384, 14.6 MB estimated) is
# compile+run validated on-chip (benchmarks/probe_warp_boundary.py).
_PALLAS_WARP_VMEM_CAP = 16 * 1024 * 1024
_WARP_BLOCK_H = 8


def _pallas_warp_vmem_bytes(img) -> int:
    """VMEM budget of one grid step of the (larger) MATMUL warp kernel.

    The round-4 guard counted only the resident image block and admitted
    shapes whose dominant temporaries it never budgeted (round-4 VERDICT
    weak #4): the per-block one-hot x-interpolation matrix ``a_mat`` is
    (block_h, wp, wp) f32 — QUADRATIC in the padded width (4.7 MB at
    wp=384, 8.4 MB at wp=512) — plus the int32 iota it is built from, the
    f32-cast chunk slice and its matmul result, and the f32 accumulator.
    All terms use the kernel's physical tile padding: sublanes pad the
    third-from-last dim's C to 8, lanes pad W to a 128 multiple."""
    n, h, w, c = img.shape
    bh = _WARP_BLOCK_H
    s = _WARP_MM_CHUNK
    hb = -(-h // bh) * bh
    wp = -(-w // 128) * 128
    cs = max(c, 8)
    item = jnp.dtype(img.dtype).itemsize
    img_block = (hb + 2 * bh + s) * cs * wp * item  # whole padded image
    a_mat = bh * wp * wp * 4                        # f32 one-hot matrix
    win = bh * wp * wp * 4                          # its int32 iota mask
    chunk = 2 * (s + bh) * cs * wp * 4              # rp f32 + dot result
    acc = 2 * bh * cs * wp * 4                      # f32 acc + out block
    return img_block + a_mat + win + chunk + acc


def _pallas_warp_supported(img) -> bool:
    """Admit shapes whose budgeted VMEM fits Mosaic's 16 MB scoped-vmem
    stack limit; reject -> the XLA slice-gather path (identical
    semantics). The production cascade shapes (wp=256 at 256x192 ->
    6.75 MB, wp=384 at 384x320 -> 14.6 MB) are both measured running
    on-chip; the first rejected width class (wp=448) falls back — pinned
    by tests/test_correlation_warp fallback-boundary tests and
    benchmarks/probe_warp_boundary.py on the real chip. (A 32 MB cap was
    falsified on-chip round 5: it admitted wp=640, whose real scoped
    stack is 24.9 MB > the 16 MB hardware limit -> compile failure
    instead of fallback.)"""
    n, h, w, c = img.shape
    if h < 2 or w < 2:
        return False  # degenerate fields: XLA path has the exact semantics
    return _pallas_warp_vmem_bytes(img) <= _PALLAS_WARP_VMEM_CAP


def _roll_lanes(rows, shift):
    """Dynamic lane rotate of a (block_h, C, W) tile.

    Mosaic's tpu.dynamic_rotate only handles 32-bit element types
    (measured on-chip 2026-08-19: 'not implemented: Rotate with
    non-32-bit data' for the bf16-glue cascade). Round-trip sub-32-bit
    data through f32 — bf16->f32->bf16 is value-exact, so the kernel's
    arithmetic (which stays in the data dtype) is unchanged."""
    if rows.dtype.itemsize == 4:
        return pltpu.roll(rows, shift, axis=2)
    return pltpu.roll(rows.astype(jnp.float32), shift,
                      axis=2).astype(rows.dtype)


def _warp_kernel(img_ref, flow_ref, out_ref, *, block_h, h, w, wp, c):
    """One (image, row-block) step of the shift-accumulate warp.

    img_ref:  (1, hb + 2*block_h, C, WP) VMEM — whole row-padded image
    flow_ref: (1, block_h, 2, WP) VMEM
    out_ref:  (1, block_h, C, WP) VMEM

    WP is the 128-aligned lane width (tpu.dynamic_rotate rejects
    unaligned lane dims — measured on-chip: 'unsupported unaligned
    shape' at W=288); w is the logical width. Pad lanes hold zero image
    and zero flow; their clamped coords would poison the adaptive
    displacement ranges, so the valid mask excludes them, their weights
    are zero for every looped displacement, and a lane-wrapped rotate
    can only deliver values onto zero weights (a valid tap's lane index
    is <= w-1 < WP, so the real taps never wrap).
    """
    hi = pl.program_id(1)
    base = hi * block_h
    dt = out_ref.dtype
    one = jnp.asarray(1.0, dt)
    zero = jnp.asarray(0.0, dt)

    u = flow_ref[0, :, 0, :].astype(jnp.float32)
    v = flow_ref[0, :, 1, :].astype(jnp.float32)
    # int32 iota + cast: Mosaic's tpu.iota only produces integer vectors
    # (same rule as ops/crop.py; interpret=True does not enforce it)
    ys = jax.lax.broadcasted_iota(jnp.int32, (block_h, wp), 0) \
        .astype(jnp.float32) + base
    xs = jax.lax.broadcasted_iota(jnp.int32, (block_h, wp), 1) \
        .astype(jnp.float32)
    # identical op sequence to _bilinear_sample_clamp (value-exactness)
    sx = jnp.clip(xs + u, 0.0, w - 1.0)
    sy = jnp.clip(ys + v, 0.0, h - 1.0)
    x0 = jnp.minimum(jnp.floor(sx), w - 2.0)
    y0 = jnp.minimum(jnp.floor(sy), h - 2.0)
    wx = (sx - x0).astype(dt)
    wy = (sy - y0).astype(dt)

    # anchor offsets (integer-valued f32): taps live at offset and offset+1
    dy0 = y0 - ys
    dx0 = x0 - xs
    # rows past the true image (last block's padding) and pad lanes
    # produce discarded output; exclude them from the ranges (zero only
    # widens, never wrong)
    valid = (ys <= (h - 1.0)) & (xs <= (w - 1.0))
    dy0r = jnp.where(valid, dy0, 0.0)
    dx0r = jnp.where(valid, dx0, 0.0)
    dy_lo = jnp.min(dy0r).astype(jnp.int32)
    ny = jnp.max(dy0r).astype(jnp.int32) - dy_lo + 2
    dx_lo = jnp.min(dx0r).astype(jnp.int32)
    nx = jnp.max(dx0r).astype(jnp.int32) - dx_lo + 2

    def dy_body(i, acc):
        dyv = dy_lo + i
        rows = img_ref[0, pl.ds(block_h + base + dyv, block_h)]
        dyf = dyv.astype(jnp.float32)
        wyd = jnp.where(dy0 == dyf, one - wy,
                        jnp.where(dy0 + 1.0 == dyf, wy, zero))

        def dx_body(j, inner):
            dxv = dx_lo + j
            shifted = _roll_lanes(rows, -dxv)
            dxf = dxv.astype(jnp.float32)
            wxd = jnp.where(dx0 == dxf, one - wx,
                            jnp.where(dx0 + 1.0 == dxf, wx, zero))
            return inner + shifted * wxd[:, None, :]

        inner = jax.lax.fori_loop(
            0, nx, dx_body, jnp.zeros((block_h, c, wp), dt))
        return acc + inner * wyd[:, None, :]

    out_ref[0] = jax.lax.fori_loop(
        0, ny, dy_body, jnp.zeros((block_h, c, wp), dt))


def resample2d_pallas(img, flow, interpret: bool = False):
    """Pallas shift-accumulate warp. Same contract as resample2d (forward
    only; use resample2d(use_pallas=True) for the differentiable entry)."""
    n, h, w, c = img.shape
    bh = _WARP_BLOCK_H
    hb = -(-h // bh) * bh
    wp = -(-w // 128) * 128  # tpu.dynamic_rotate needs 128-aligned lanes

    # (N, H, C, W) with bh padding rows above and below: every dynamic dy
    # slice the kernel can request is in-bounds (padded rows only ever
    # meet zero weights); lanes padded to WP (see _warp_kernel docstring)
    imgp = jnp.pad(jnp.transpose(img, (0, 1, 3, 2)),
                   ((0, 0), (bh, bh + hb - h), (0, 0), (0, wp - w)))
    flowp = jnp.pad(jnp.transpose(flow, (0, 1, 3, 2)),
                    ((0, 0), (0, hb - h), (0, 0), (0, wp - w)))

    kernel = functools.partial(_warp_kernel, block_h=bh, h=h, w=w, wp=wp,
                               c=c)
    out = pl.pallas_call(
        kernel,
        grid=(n, hb // bh),
        in_specs=[
            pl.BlockSpec((1, hb + 2 * bh, c, wp),
                         lambda ni, hi: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, 2, wp), lambda ni, hi: (ni, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, c, wp), lambda ni, hi: (ni, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hb, c, wp), img.dtype),
        interpret=interpret,
    )(imgp, flowp)
    return jnp.transpose(out[:, :h, :, :w], (0, 1, 3, 2))


# dy rows contracted per packed matmul (see _warp_kernel_mm). Env knob for
# the on-chip probe only: (S + block_h) * C <= 128 keeps the packed dot a
# single systolic pass, so S=32 (M=120) costs the same per pass as S=16
# (M=72) while halving the chunk count for wide-dy flows.
_WARP_MM_CHUNK = int(os.environ.get("FLOWTRACK_WARP_MM_CHUNK", "16"))

# Weight-construction variant (see _warp_kernel_mm): "v2" = int-iota
# compares + selects; "v3" = relu(1 - |i - sx|) closed form. v3 is the
# production default since the r5e on-chip A/B (benchmarks/
# PROBE_WARP_AB_r05.jsonl): it wins every (shape, flow-regime) cell —
# cascade-regime 384x288 2046 -> 1237 us/img, 256x192 757 -> 682, and
# e2e b4 165.55 -> 167.0 f/s — because the kernel's cost is the VPU
# a_mat construction, which v3 does with 4 elementwise ops. Env knob is
# the e2e A/B switch; resample2d_pallas_mm(relu_weights=...) overrides
# per call (the on-chip microbench path).
_WARP_MM_RELU = os.environ.get("FLOWTRACK_WARP_MM_WEIGHTS", "v3") == "v3"


def _warp_kernel_mm(img_ref, flow_ref, out_ref, *, block_h, h, w, wp, c,
                    relu_weights=False):
    """Matmul variant: the x-interpolation as an MXU contraction.

    The shift-accumulate kernel's dx loop is a dynamic lane rotate per
    displacement — data-dependent pass count, and tpu.dynamic_rotate is
    the most constrained Mosaic op we use (32-bit only, 128-aligned
    only). This variant eliminates it: per output row b, bilinear
    x-interpolation is a linear map, i.e. one (WP_in, WP_out) matrix
    A[b] with exactly two nonzeros per column — A[b, i, j] =
    (i == x0[b,j])·(1−wx[b,j]) + (i == x0[b,j]+1)·wx[b,j] — built once
    per block. Weight VALUES are dt-rounded (mirroring the XLA path's
    products); contraction in f32 at HIGHEST precision.

    PACKED-dy formulation (v2 — the r4 profiler trace showed v1's dy
    loop redoing the full x-contraction per displacement was 35% of the
    whole b4 device program, ~56 ms per 63-image warp): each output row
    only ever uses TWO dy taps, so contracting all block rows for every
    dy in the block's range multiplied the MXU work by ny/2 for nothing.
    v2 packs a CHUNK of S=_WARP_MM_CHUNK consecutive dy candidate rows
    (plus the block_h skew) into the matmul's M dimension — one
    (S+bh)·C-row dot per output row per chunk covers S displacements at
    once, because M ≤ 128 rides the systolic array in a single pass
    either way. The y-tap weights then select/combine the (at most two)
    relevant packed rows per output element on the VPU. MXU passes drop
    ~S×; cost is adaptive in ceil(ny/S) chunks (smooth cascade flow:
    usually 1-2).

    relu_weights ("v3"): the r5 trace shows the kernel's cost is NOT the
    MXU dots (M <= 128 rides one systolic pass) but the O(bh*wp^2) VPU
    construction of a_mat. Anchored 2-tap bilinear weights have a closed
    form — weight of input i for sample position s is exactly
    relu(1 - |i - s|) — so v3 builds a_mat with sub/abs/sub/max instead
    of int-iota + 2 compares + 2 selects + add, and uses the same form
    for the y-tap selector. The second tap rounds once more than v2
    (fl(1 - fl(1 - wx)) vs wx): <= 1 ulp on the weight, within the
    kernel's ~1-ulp-of-XLA contract (integer flows stay bitwise-exact:
    wx = 0 makes both taps exact). Sub-32-bit dtypes round the built
    matrix to dt, mirroring v2's dt-rounded weight values.
    """
    hi = pl.program_id(1)
    base = hi * block_h
    dt = out_ref.dtype
    one = jnp.asarray(1.0, dt)
    s_chunk = _WARP_MM_CHUNK
    rows_per_chunk = s_chunk + block_h  # chunk dys skewed by output row

    u = flow_ref[0, :, 0, :].astype(jnp.float32)
    v = flow_ref[0, :, 1, :].astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.int32, (block_h, wp), 0) \
        .astype(jnp.float32) + base
    xs = jax.lax.broadcasted_iota(jnp.int32, (block_h, wp), 1) \
        .astype(jnp.float32)
    sx = jnp.clip(xs + u, 0.0, w - 1.0)
    sy = jnp.clip(ys + v, 0.0, h - 1.0)
    x0 = jnp.minimum(jnp.floor(sx), w - 2.0)
    y0 = jnp.minimum(jnp.floor(sy), h - 2.0)
    wx = (sx - x0).astype(dt)
    wy = (sy - y0).astype(dt)

    dy0 = y0 - ys
    valid = (ys <= (h - 1.0)) & (xs <= (w - 1.0))
    dy0r = jnp.where(valid, dy0, 0.0)
    dy_lo = jnp.min(dy0r).astype(jnp.int32)
    ny = jnp.max(dy0r).astype(jnp.int32) - dy_lo + 2
    n_chunks = (ny + s_chunk - 1) // s_chunk

    # A[b, i, j]: weight of input lane i for output lane j of row b.
    # Selects run in f32: a sub-32-bit select here makes Mosaic relayout
    # the 3-D i1 mask between (8,128) and (16,128) tilings — 'Invalid
    # relayout' (measured); the WEIGHT VALUES stay dt-rounded (wx is
    # already .astype(dt)) so bf16 images keep bf16-path products.
    if relu_weights:
        # v3: closed-form anchored bilinear weights (docstring) — 4
        # cheap f32 elementwise ops per element, no int compares, no
        # selects (and so none of the sub-32-bit select relayout hazard)
        winf = jax.lax.broadcasted_iota(              # iota integer-only
            jnp.int32, (block_h, wp, wp), 1).astype(jnp.float32)
        sxc = x0 + wx.astype(jnp.float32)             # dt-rounded frac
        a_mat = jnp.maximum(0.0, 1.0 - jnp.abs(winf - sxc[:, None, :]))
        if jnp.dtype(dt).itemsize < 4:
            a_mat = a_mat.astype(dt).astype(jnp.float32)
    else:
        x0i = x0.astype(jnp.int32)                  # (bh, wp)
        wxf = wx.astype(jnp.float32)
        omf = (one - wx).astype(jnp.float32)
        win = jax.lax.broadcasted_iota(jnp.int32, (block_h, wp, wp), 1)
        a_mat = (jnp.where(win == x0i[:, None, :], omf[:, None, :], 0.0)
                 + jnp.where(win == x0i[:, None, :] + 1, wxf[:, None, :],
                             0.0))                  # (bh, wp_in, wp_out)

    wyf = wy.astype(jnp.float32)
    omy = (one - wy).astype(jnp.float32)
    # packed-row index l along the chunk slice (l-th slice row holds, for
    # output row b, the tap at dy = chunk_lo + l - b)
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (rows_per_chunk, wp), 0)

    # f32 data: HIGHEST (6-pass bf16 decomposition, products exact to f32
    # rounding — the fp32-glue golden-parity contract). Sub-32-bit data:
    # single-pass DEFAULT — the XLA reference path for bf16 images rounds
    # every tap product to bf16 anyway, so a bf16xbf16->f32-accumulate
    # contraction is at least as accurate while 6x cheaper on the MXU.
    dot_prec = (jax.lax.Precision.HIGHEST
                if jnp.dtype(dt).itemsize == 4 else None)

    def chunk_body(k, acc):
        chunk_lo = dy_lo + k * s_chunk
        # slice rows [base + chunk_lo, base + chunk_lo + S + bh): serves
        # every (b, dy) pair of the chunk via slice-local index b+dy-lo
        rows = img_ref[0, pl.ds(block_h + base + chunk_lo, rows_per_chunk)]
        rp = rows.reshape(rows_per_chunk * c, wp).astype(jnp.float32)
        contribs = []
        for b in range(block_h):
            m = jax.lax.dot(rp, a_mat[b], precision=dot_prec)
            m3 = m.reshape(rows_per_chunk, c, wp)
            dy_val = (chunk_lo - b + l_idx).astype(jnp.float32)
            # only this chunk's dy window [chunk_lo, chunk_lo + S): the
            # slice also exposes the skew rows of neighboring chunks,
            # which must not double-count
            in_chunk = (l_idx >= b) & (l_idx < b + s_chunk)
            if relu_weights:
                syc = dy0[b] + wyf[b]               # dt-rounded frac
                wraw = jnp.maximum(
                    0.0, 1.0 - jnp.abs(dy_val - syc[None, :]))
                if jnp.dtype(dt).itemsize < 4:
                    wraw = wraw.astype(dt).astype(jnp.float32)
                wsel = jnp.where(in_chunk, wraw, 0.0)   # (S+bh, wp)
            else:
                wsel = (jnp.where(in_chunk & (dy0[b] == dy_val),
                                  omy[b][None, :], 0.0)
                        + jnp.where(in_chunk & (dy0[b] + 1.0 == dy_val),
                                    wyf[b][None, :], 0.0))  # (S+bh, wp)
            contribs.append(jnp.sum(m3 * wsel[:, None, :], axis=0))
        return acc + jnp.stack(contribs)            # (bh, C, wp)

    acc = jax.lax.fori_loop(
        0, n_chunks, chunk_body, jnp.zeros((block_h, c, wp), jnp.float32))
    out_ref[0] = acc.astype(dt)


def resample2d_pallas_mm(img, flow, interpret: bool = False,
                         relu_weights=None):
    """Pallas matmul warp (see _warp_kernel_mm). Same contract as
    resample2d_pallas. relu_weights=None reads the module default
    (FLOWTRACK_WARP_MM_WEIGHTS env, the e2e A/B switch)."""
    if relu_weights is None:
        relu_weights = _WARP_MM_RELU
    n, h, w, c = img.shape
    bh = _WARP_BLOCK_H
    hb = -(-h // bh) * bh
    wp = -(-w // 128) * 128
    # the last packed chunk's (S + bh)-row slice can start as late as
    # dy_hi + 1 rounded up to a chunk boundary — pad S extra rows below
    # so every chunk slice is in-bounds (padded rows meet zero weights)
    pad_below = bh + _WARP_MM_CHUNK + hb - h

    imgp = jnp.pad(jnp.transpose(img, (0, 1, 3, 2)),
                   ((0, 0), (bh, pad_below), (0, 0), (0, wp - w)))
    flowp = jnp.pad(jnp.transpose(flow, (0, 1, 3, 2)),
                    ((0, 0), (0, hb - h), (0, 0), (0, wp - w)))

    kernel = functools.partial(_warp_kernel_mm, block_h=bh, h=h, w=w,
                               wp=wp, c=c, relu_weights=relu_weights)
    out = pl.pallas_call(
        kernel,
        grid=(n, hb // bh),
        in_specs=[
            pl.BlockSpec((1, hb + 2 * bh + _WARP_MM_CHUNK, c, wp),
                         lambda ni, hi: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, 2, wp), lambda ni, hi: (ni, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, c, wp), lambda ni, hi: (ni, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hb, c, wp), img.dtype),
        interpret=interpret,
    )(imgp, flowp)
    return jnp.transpose(out[:, :h, :, :w], (0, 1, 3, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _resample2d_pallas_diff(img, flow, interpret=False, matmul=False):
    fn = resample2d_pallas_mm if matmul else resample2d_pallas
    return fn(img, flow, interpret=interpret)


def _warp_fwd(img, flow, interpret=False, matmul=False):
    fn = resample2d_pallas_mm if matmul else resample2d_pallas
    return fn(img, flow, interpret=interpret), (img, flow)


def _warp_bwd(interpret, matmul, res, g):
    # Backward reuses the XLA formulation's gradient (same policy and
    # rationale as ops/correlation.py: the warp backward is a tiny
    # fraction of cascade fine-tune work; parity + finite-difference
    # tested in tests/test_correlation_warp.py).
    img, flow = res
    _, vjp = jax.vjp(lambda a, b: resample2d(a, b), img, flow)
    return vjp(g)


_resample2d_pallas_diff.defvjp(_warp_fwd, _warp_bwd)


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
