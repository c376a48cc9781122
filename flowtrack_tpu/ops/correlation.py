"""Correlation (cost volume) op — the FlowNetC matching layer.

Behavior contract (SURVEY.md section 3 "FlowNetC / correlation" row;
reference lineage: models/flownet/correlation_package/ CUDA extension —
mount empty, semantics per FlowNet paper arXiv:1504.06852 and the
flownet2-pytorch kernel conventions):

  * kernel_size=1, max_displacement=20, stride1=1, stride2=2, pad=20.
  * For each displacement (dy, dx) on the 21x21 grid {-20,-18,...,20}^2,
    output channel c(dy,dx) = mean over input channels of
    f1[y, x, :] * f2[y+dy, x+dx, :], reading zero outside the map.
  * Channel order: dy-major, dx-minor (the CUDA kernel's
    ``top_channel = y_shift * grid_w + x_shift`` layout).
  * Normalizer = kernel_area * C (the CUDA ``sumelems``); = C here.

TPU-native design: the reference's ~700-line CUDA forward/backward becomes

  1. ``correlation_xla`` — D*D shifted elementwise products over a padded f2;
     XLA fuses the slices; differentiable (training path) and the golden
     reference for the kernel;
  2. ``correlation_pallas`` — a Pallas kernel. f2 stays in HBM; each grid
     step DMAs one (block_h + 2*md)-row halo into VMEM scratch and a
     ``fori_loop`` walks the D*D displacements, accumulating channel
     dot-products on the VPU. The 441 shifted copies of f2 are never
     materialized in HBM (SURVEY.md section 8 hard part (c)).

The displacement axis lives in the SECOND dim of the kernel output
(N, D*D, H, W) so the inner loop writes full (block_h, W) lane-tiles at a
dynamic outer index; the public function transposes back to NHWC's
(N, H, W, D*D).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def displacement_grid(max_displacement: int = 20, stride2: int = 2):
    """Displacement values along one axis: {-md, -md+s2, ..., md}."""
    return list(range(-max_displacement, max_displacement + 1, stride2))


def correlation_xla(f1, f2, max_displacement: int = 20, stride2: int = 2):
    """Pure-XLA correlation. f1, f2: (N, H, W, C) -> (N, H, W, D*D) f32."""
    n, h, w, c = f1.shape
    disps = displacement_grid(max_displacement, stride2)
    md = max_displacement
    f1 = f1.astype(jnp.float32)
    f2p = jnp.pad(f2.astype(jnp.float32),
                  ((0, 0), (md, md), (md, md), (0, 0)))
    inv_c = 1.0 / c

    outs = []
    for dy in disps:
        for dx in disps:
            f2s = jax.lax.slice(
                f2p, (0, md + dy, md + dx, 0), (n, md + dy + h, md + dx + w, c)
            )
            outs.append(jnp.sum(f1 * f2s, axis=-1) * inv_c)
    return jnp.stack(outs, axis=-1)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _corr_kernel(f1_ref, f2_hbm, out_ref, f2_vmem, sem, *,
                 block_h, md, stride2, d, inv_c):
    """One (image, row-block) step: DMA the f2 halo, loop displacements.

    f1_ref:  (1, block_h, W, C) VMEM (auto-pipelined)
    f2_hbm:  (N, H + 2*md + pad, W + 2*md, C) in HBM/ANY
    out_ref: (1, D, D, block_h, W) VMEM
    f2_vmem: (block_h + 2*md, W + 2*md, C) scratch

    Mosaic constraint (verified on hardware): dynamic slice starts are only
    allowed on UNTILED leading dims — so the dynamic dy walks dim 0 of the
    scratch inside a fori_loop, while the d x-shifts are STATIC unrolled
    slices on the tiled W dim.
    """
    ni = pl.program_id(0)
    hi = pl.program_id(1)

    copy = pltpu.make_async_copy(
        f2_hbm.at[ni, pl.ds(hi * block_h, block_h + 2 * md)],
        f2_vmem,
        sem,
    )
    copy.start()

    f1 = f1_ref[0].astype(jnp.float32)  # (block_h, W, C)
    w = f1.shape[1]
    copy.wait()

    def body(iy, _):
        rows = f2_vmem[pl.ds(iy * stride2, block_h)]  # (block_h, W+2md, C)
        for jx in range(d):
            dx = jx * stride2
            f2s = rows[:, dx: dx + w, :].astype(jnp.float32)
            out_ref[0, iy, jx] = jnp.sum(f1 * f2s, axis=-1) * inv_c
        return 0

    jax.lax.fori_loop(0, d, body, 0)


def correlation_pallas(f1, f2, max_displacement: int = 20, stride2: int = 2,
                       block_h: int = 8, interpret: bool = False):
    """Pallas correlation. f1, f2: (N, H, W, C) -> (N, H, W, D*D) f32."""
    n, h, w, c = f1.shape
    md = max_displacement
    disps = displacement_grid(md, stride2)
    d = len(disps)

    hb = -(-h // block_h) * block_h
    f1p = jnp.pad(f1, ((0, 0), (0, hb - h), (0, 0), (0, 0)))
    f2p = jnp.pad(f2, ((0, 0), (md, md + hb - h), (md, md), (0, 0)))

    kernel = functools.partial(
        _corr_kernel, block_h=block_h, md=md, stride2=stride2, d=d,
        inv_c=1.0 / c)

    out = pl.pallas_call(
        kernel,
        grid=(n, hb // block_h),
        in_specs=[
            pl.BlockSpec((1, block_h, w, c), lambda ni, hi: (ni, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, d, d, block_h, w), lambda ni, hi: (ni, 0, 0, hi, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d, d, hb, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_h + 2 * md, w + 2 * md, c), f2.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(f1p, f2p)
    out = out.reshape(n, d * d, hb, w)
    return jnp.transpose(out[:, :, :h], (0, 2, 3, 1))


@functools.lru_cache(maxsize=None)
def _batchable_pallas(max_displacement: int, stride2: int, interpret: bool):
    """correlation_pallas with a custom vmap rule.

    Pallas' automatic pallas_call batching prepends a grid dim and gives
    every block an index_map over it — but the kernel's f2 operand lives
    in memory space ANY (HBM, manually DMA'd), and the TPU lowering only
    accepts ANY-space blocks with a TRIVIAL index_map (verified on
    hardware 2026-08-19: the C>=2-stream FlowNet2 clip program failed to
    lower; bench.py's OOM fallback masked it by matching 'memory' in the
    error text). Correlation is independent per image, so the mapped axis
    folds into the kernel's own image grid dim — exact semantics, and a
    bigger grid for the same program."""

    @jax.custom_batching.custom_vmap
    def call(f1, f2):
        return correlation_pallas(f1, f2, max_displacement, stride2,
                                  interpret=interpret)

    @call.def_vmap
    def _rule(axis_size, in_batched, f1, f2):  # noqa: ANN001
        f1_b, f2_b = in_batched
        if not f1_b:
            f1 = jnp.broadcast_to(f1[None], (axis_size,) + f1.shape)
        if not f2_b:
            f2 = jnp.broadcast_to(f2[None], (axis_size,) + f2.shape)
        b, n = f1.shape[0], f1.shape[1]
        out = call(f1.reshape((b * n,) + f1.shape[2:]),
                   f2.reshape((b * n,) + f2.shape[2:]))
        return out.reshape((b, n) + out.shape[1:]), True

    return call


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _correlation_pallas_diff(f1, f2, max_displacement, stride2,
                             interpret=False):
    return _batchable_pallas(max_displacement, stride2, interpret)(f1, f2)


def _corr_fwd(f1, f2, max_displacement, stride2, interpret=False):
    return _batchable_pallas(max_displacement, stride2,
                             interpret)(f1, f2), (f1, f2)


def _corr_bwd(max_displacement, stride2, interpret, res, g):
    # Backward of the XLA formulation is algebraically identical; reuse it
    # (gradient parity + finite-difference checked in
    # tests/test_correlation_warp.py; a hand-written Pallas backward would
    # only matter if TPU flow TRAINING became correlation-bound — at FlowNetC
    # shapes the backward is a tiny fraction of the conv backward work, so
    # the XLA formulation is the deliberate choice).
    f1, f2 = res
    _, vjp = jax.vjp(
        lambda a, b: correlation_xla(a, b, max_displacement, stride2), f1, f2)
    return vjp(g)


_correlation_pallas_diff.defvjp(_corr_fwd, _corr_bwd)


def correlation(f1, f2, max_displacement: int = 20, stride2: int = 2,
                use_pallas: bool = False, interpret: bool = False):
    """Public entry: FlowNetC cost volume. NHWC in, (N, H, W, D*D) out."""
    if use_pallas:
        return _correlation_pallas_diff(f1, f2, max_displacement, stride2,
                                        interpret)
    return correlation_xla(f1, f2, max_displacement, stride2)
