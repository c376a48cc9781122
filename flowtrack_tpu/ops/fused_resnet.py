"""VMEM-resident fused ResNet bottleneck stages (Pallas) — built, validated,
and PERF-FALSIFIED against XLA on this chip. Kept as tested-correct
experimental code; the production inference path stays on the plain flax
model (see the measurement story below before trying to "turn this on").

Hypothesis (round-2 perf push): XLA runs each backbone conv as a separate
HBM round trip, holding every ResNet-50 stage at 25-35% MFU on the v5e
(batch-1024 bf16 crops at 256x192: stem 8.9ms / layer1 28.0 / layer2 24.9 /
layer3 22.9 / layer4 11.7 — measured with the amortized in-jit protocol of
benchmarks/probe_stages.py). A bottleneck block's interior activations are
small enough to stay in VMEM, so fusing ALL blocks of a stage into one
batch-tiled Pallas kernel should cut stage HBM traffic ~6x and approach the
MXU bound.

Measured outcome on hardware (same protocol): layer1 30.8ms (XLA 28.0),
layer2 25.9 (24.9), layer3 30.4 (22.9) — parity at best, loss at worst,
with 2-4 MINUTE Mosaic compiles per stage. The fused kernel eliminates the
HBM round trips but becomes bound on Mosaic's generic VPU lowering of the
inter-matmul epilogues (bias+ReLU+cast on fp32 accumulators) and the
colpatch staging stores, which XLA's tuned conv emitters overlap with the
MXU drain. Two sibling rewrites fell the same way: a space-to-depth stem
(13.7ms vs 9.1 — the input shuffle costs more than the 3-channel lane waste
it removes) and a sub-pixel deconv decomposition (unnecessary — XLA already
runs the dilated deconv head near peak on true FLOPs). Together with the
round-1/2 int8 results this pins the plain-XLA bf16 conv path as the
practical per-op ceiling on this chip/toolchain; the honest MFU of the pose
net is ~42% of bf16 peak by XLA's flop count (~30% on true flops, the gap
being dilated-deconv zero-taps XLA never executes).

Semantics: inference only (BatchNorm folded into conv weight+bias with the
exact _fold math from models/quantize.py). The training path keeps the
standard flax model. The reference has no analog (its cuDNN convs
round-trip global memory the same way XLA does). SURVEY.md section 3
PoseResNet row; run `BENCH_FUSED=1 python bench.py` to reproduce the
headline comparison on hardware.

Design per stage kernel (final form — see _stage_kernel for the layout
rationale):
  * grid over batch tiles (Bt crops/step); spatial extent is whole — no
    halos between grid steps;
  * 1x1 convs (conv1/conv3/downsample) are plain MXU matmuls over the
    (Bt*H*W, C) collapse;
  * the 3x3 conv2 stages its 3 COLUMN taps side by side into a
    zero-bordered "colpatch" VMEM scratch (stores re-layout; Mosaic cannot
    lane-concatenate slices with mismatched spatial-offset layouts), then
    contracts one kernel ROW per matmul (K=3F) — row taps are free offset
    slices of the scratch;
  * a striding first block runs through native XLA convs instead
    (_block_conv_xla): the strided-tap Mosaic lowering measured both slow
    and numerically wrong on hardware;
  * fp32 accumulation (preferred_element_type) + folded bias + ReLU, cast
    back to bf16 between matmuls; the residual joins in fp32;
  * stages whose folded weights exceed the VMEM budget are split into
    chunks of whole blocks (one pallas_call each); the extra
    chunk-boundary HBM round trip is the stage tensor only.

`fused_stage_ref` is the jnp/XLA twin (same folded math) used as the CPU
fallback and the golden reference for the kernel tests.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flowtrack_tpu.models.pose_resnet import RESNET_SPECS

# Per-chunk folded-weight budget (bytes, bf16). The kernel raises Mosaic's
# scoped-vmem limit to 100MB (CompilerParams), but weights are re-fetched
# per grid step unless they fit comfortably next to the double-buffered IO
# blocks and colpatch scratch — keep chunks small.
_WEIGHT_BUDGET = 6 * 2 ** 20


# ---------------------------------------------------------------------------
# Parameter preparation (fold + reshape to matmul layouts)
# ---------------------------------------------------------------------------


def _as_matmul(kernel):
    """(1,1,Cin,Cout) -> (Cin, Cout); (3,3,F,F) -> (3, 3F, F) with the
    column taps flattened into K (row-tap-major per row) so the kernel can
    contract one whole kernel row per matmul."""
    k = jnp.asarray(kernel)
    if k.shape[0] == 1:
        return k.reshape(k.shape[2], k.shape[3])
    kh, kw, cin, cout = k.shape
    return k.reshape(kh, kw * cin, cout)


def block_from_folded(node: dict) -> dict:
    """One folded block's {conv1/conv2/conv3[/downsample_conv]:
    {kernel, bias}} -> the kernel's w1..bd dict (single source of the
    matmul weight layout; used by tests and probes too)."""
    blk = {}
    for ci, (wk, bk) in zip(("conv1", "conv2", "conv3"),
                            (("w1", "b1"), ("w2", "b2"), ("w3", "b3"))):
        blk[wk] = _as_matmul(node[ci]["kernel"]).astype(jnp.bfloat16)
        blk[bk] = jnp.asarray(node[ci]["bias"], jnp.float32).reshape(1, -1)
    if "downsample_conv" in node:
        blk["wd"] = _as_matmul(
            node["downsample_conv"]["kernel"]).astype(jnp.bfloat16)
        blk["bd"] = jnp.asarray(node["downsample_conv"]["bias"],
                                jnp.float32).reshape(1, -1)
    return blk


def stage_blocks_from_folded(folded: dict, num_layers: int):
    """models/quantize.fold_pose_resnet output -> per-stage block params.

    Returns a list (one entry per stage) of lists of dicts with keys
    w1,b1,w2,b2,w3,b3[,wd,bd]; weights bf16 matmul-shaped, biases (1,C) f32.
    """
    _, stage_sizes = RESNET_SPECS[num_layers]
    stages = []
    for si, nblocks in enumerate(stage_sizes):
        blocks = [block_from_folded(folded[f"layer{si + 1}_{bi}"])
                  for bi in range(nblocks)]
        stages.append(blocks)
    return stages


# ---------------------------------------------------------------------------
# jnp reference (CPU fallback + kernel golden)
# ---------------------------------------------------------------------------


def _block_ref(x, blk, stride: int):
    """One folded bottleneck block, same matmul decomposition as the kernel."""
    bt, h, w, cin = x.shape
    f = blk["w1"].shape[1]
    ho, wo = h // stride, w // stride

    y = jnp.dot(x.reshape(-1, cin), blk["w1"],
                preferred_element_type=jnp.float32)
    y = jnp.maximum(y + blk["b1"], 0.0).astype(jnp.bfloat16)
    y = y.reshape(bt, h, w, f)

    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    w2 = blk["w2"]  # (3, 3F, F)
    for a in range(3):
        for b in range(3):
            tap = jax.lax.slice(
                yp, (0, a, b, 0), (bt, a + (ho - 1) * stride + 1,
                                   b + (wo - 1) * stride + 1, f),
                (1, stride, stride, 1))
            t = jnp.dot(tap.reshape(-1, f), w2[a, b * f:(b + 1) * f],
                        preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    y = jnp.maximum(acc + blk["b2"], 0.0).astype(jnp.bfloat16)

    y = jnp.dot(y, blk["w3"], preferred_element_type=jnp.float32)
    y = y + blk["b3"]

    if "wd" in blk:
        xs = x[:, ::stride, ::stride, :]
        res = jnp.dot(xs.reshape(-1, cin), blk["wd"],
                      preferred_element_type=jnp.float32) + blk["bd"]
    else:
        res = x.reshape(-1, cin).astype(jnp.float32)
    out = jnp.maximum(y + res, 0.0).astype(jnp.bfloat16)
    return out.reshape(bt, ho, wo, -1)


def fused_stage_ref(x, blocks: Sequence[dict], stride: int):
    """XLA twin of the fused stage (folded-BN bottleneck chain)."""
    for i, blk in enumerate(blocks):
        x = _block_ref(x, blk, stride if i == 0 else 1)
    return x


def _conv(x, k, stride, pad):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _block_conv_xla(x, blk, stride: int):
    """Folded block via native XLA convs — used for the striding first
    block of a stage (runs at XLA's per-op conv roofline, unlike the
    matmul formulation whose strided slices lower poorly)."""
    f = blk["w1"].shape[1]
    cin = blk["w1"].shape[0]
    y = _conv(x, blk["w1"].reshape(1, 1, cin, f), 1, 0)
    y = jnp.maximum(y + blk["b1"][0], 0.0).astype(jnp.bfloat16)
    y = _conv(y, blk["w2"].reshape(3, 3, f, f), stride, 1)
    y = jnp.maximum(y + blk["b2"][0], 0.0).astype(jnp.bfloat16)
    y = _conv(y, blk["w3"].reshape(1, 1, f, -1), 1, 0)
    y = y + blk["b3"][0]
    if "wd" in blk:
        res = _conv(x, blk["wd"].reshape(1, 1, cin, -1), stride, 0)
        res = res + blk["bd"][0]
    else:
        res = x
    return jnp.maximum(y + res, 0.0).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _flatten_blocks(blocks):
    """Fixed arg order: per block w1,b1,w2,b2,w3,b3[,wd,bd]."""
    flat, meta = [], []
    for blk in blocks:
        has_down = "wd" in blk
        meta.append(has_down)
        flat += [blk["w1"], blk["b1"], blk["w2"], blk["b2"],
                 blk["w3"], blk["b3"]]
        if has_down:
            flat += [blk["wd"], blk["bd"]]
    return flat, meta


def _stage_kernel(x_ref, *refs, meta, bt, h, w):
    """One batch tile through every block of the chunk.

    refs = [weight refs...] + [out_ref, colpatch_scratch]. All blocks are
    stride 1 (a striding first block runs through the XLA formulation —
    see fused_stage_pallas).

    conv2 formulation (the part Mosaic's layout rules dictate): the 3
    COLUMN taps of the 3x3 kernel are stored side by side into the
    zero-bordered ``colpatch`` scratch (stores re-layout; Mosaic cannot
    lane-concatenate slices whose vector layouts carry different spatial
    offsets), giving (H+2, W, 3F). The 3 ROW taps then need no data
    movement at all: each is an offset slice of colpatch fed STRAIGHT to
    the MXU as a (M, 3F) operand — shifting along the untiled row dim is
    free. 3 matmuls with K=3F instead of 9 staged K=F taps: full-K MXU
    and ~5x less VPU copy traffic.
    """
    out_ref, col_ref = refs[-2], refs[-1]
    wrefs = refs[:-2]

    x = x_ref[:]  # (Bt, H, W, Cin) bf16
    wi = 0
    cur_h, cur_w = h, w
    for bi, has_down in enumerate(meta):
        w1, b1, w2, b2, w3, b3 = (wrefs[wi + j] for j in range(6))
        wi += 6
        if has_down:
            wd, bd = wrefs[wi], wrefs[wi + 1]
            wi += 2
        cin = x.shape[-1]
        f = w1.shape[1]
        ho, wo = cur_h, cur_w

        # conv1 (1x1)
        y = jnp.dot(x.reshape(-1, cin), w1[:],
                    preferred_element_type=jnp.float32)
        y = jnp.maximum(y + b1[:], 0.0).astype(jnp.bfloat16)

        # conv2 (3x3, stride 1); w2 ref layout is (3, 3F, F).
        # colpatch: column taps side by side, row taps as free offsets
        yv = y.reshape(bt, cur_h, cur_w, f)
        ch, cw = cur_h, cur_w
        col_ref[:, :ch + 2, :cw, :3 * f] = jnp.zeros(
            (bt, ch + 2, cw, 3 * f), jnp.bfloat16)
        col_ref[:, 1:ch + 1, 1:cw, 0:f] = yv[:, :, :cw - 1]
        col_ref[:, 1:ch + 1, 0:cw, f:2 * f] = yv
        col_ref[:, 1:ch + 1, 0:cw - 1, 2 * f:3 * f] = yv[:, :, 1:]
        y = None
        for a in range(3):
            rows = col_ref[:, a:a + ch, :cw, :3 * f]
            t = jnp.dot(rows.reshape(-1, 3 * f), w2[a],
                        preferred_element_type=jnp.float32)
            y = t if y is None else y + t
        y = jnp.maximum(y + b2[:], 0.0).astype(jnp.bfloat16)

        # conv3 (1x1) + residual
        y = jnp.dot(y, w3[:], preferred_element_type=jnp.float32) + b3[:]
        if has_down:
            res = jnp.dot(x.reshape(-1, cin), wd[:],
                          preferred_element_type=jnp.float32) + bd[:]
        else:
            res = x.reshape(-1, cin).astype(jnp.float32)
        x = jnp.maximum(y + res, 0.0).astype(jnp.bfloat16)
        x = x.reshape(bt, ho, wo, -1)
        cur_h, cur_w = ho, wo

    out_ref[:] = x


def _chunk_blocks(blocks):
    """Split a stage's blocks into chunks within the VMEM weight budget."""
    chunks, cur, cur_bytes = [], [], 0
    for blk in blocks:
        nbytes = sum(int(np.prod(v.shape)) * v.dtype.itemsize
                     for v in blk.values())
        if cur and cur_bytes + nbytes > _WEIGHT_BUDGET:
            chunks.append(cur)
            cur, cur_bytes = [], 0
        cur.append(blk)
        cur_bytes += nbytes
    chunks.append(cur)
    return chunks


def _pick_bt(h, w, cin, f, batch):
    """Largest batch tile whose working set stays well under VMEM."""
    for bt in (16, 8, 4, 2, 1):
        if batch % bt:
            continue
        # io blocks are double-buffered by the pipeline; scratch is the
        # (Bt, H+2, W, 3F) colpatch
        io = 2 * 2 * bt * h * w * max(cin, 4 * f) * 2
        scratch = bt * (h + 2) * w * 3 * f * 2
        if io + scratch < 40 * 2 ** 20:
            return bt
    return 1


def fused_stage_pallas(x, blocks: Sequence[dict], stride: int,
                       interpret: bool = False):
    """Fused bottleneck stage on TPU. x: (B, H, W, Cin) bf16.

    A striding first block runs through the XLA matmul formulation (the
    strided-tap Mosaic lowering measured both slow AND numerically wrong on
    hardware — see module docstring); all stride-1 blocks run fused."""
    rest = blocks
    if stride != 1:
        x = _block_conv_xla(x, blocks[0], stride)
        rest = blocks[1:]
    for chunk in _chunk_blocks(rest):
        x = _chunk_pallas(x, chunk, interpret)
    return x


def _chunk_pallas(x, blocks, interpret):
    b, h, w, cin = x.shape
    f = blocks[0]["w1"].shape[1]
    cout = blocks[-1]["w3"].shape[1]
    ho, wo = h, w
    bt = _pick_bt(h, w, cin, f, b)
    flat, meta = _flatten_blocks(blocks)
    scratch = [pltpu.VMEM((bt, h + 2, w, 3 * f), jnp.bfloat16)]

    kernel = functools.partial(_stage_kernel, meta=meta, bt=bt, h=h, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[pl.BlockSpec((bt, h, w, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat],
        out_specs=pl.BlockSpec((bt, ho, wo, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, cout), jnp.bfloat16),
        scratch_shapes=scratch,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(x, *flat)
    return out


def fused_stage(x, blocks: Sequence[dict], stride: int,
                use_pallas: bool = True, interpret: bool = False):
    """Public entry: fused folded-BN bottleneck stage (inference)."""
    if use_pallas:
        return fused_stage_pallas(x, blocks, stride, interpret=interpret)
    return fused_stage_ref(x, blocks, stride)


# ---------------------------------------------------------------------------
# Whole-model inference adapter (drop-in for PosePredictor / ClipTracker)
# ---------------------------------------------------------------------------


def prepare_fused_variables(variables, num_layers: int):
    """Float PoseResNet variables -> the fused inference pytree."""
    from flowtrack_tpu.models.quantize import fold_pose_resnet

    folded = fold_pose_resnet(variables)
    head = {}
    for i in range(3):
        name = f"deconv{i}"
        if name in folded:
            head[name] = {
                "kernel": jnp.asarray(folded[name]["kernel"],
                                      jnp.bfloat16),
                "bias": jnp.asarray(folded[name]["bias"],
                                    jnp.float32),
            }
    return {
        "stem": {"kernel": jnp.asarray(folded["conv1"]["kernel"],
                                       jnp.bfloat16),
                 "bias": jnp.asarray(folded["conv1"]["bias"], jnp.float32)},
        "stages": stage_blocks_from_folded(folded, num_layers),
        "head": head,
        "final": {"kernel": jnp.asarray(folded["final_kernel"],
                                        jnp.bfloat16),
                  "bias": jnp.asarray(folded["final_bias"], jnp.float32)},
    }


class FusedPoseAdapter:
    """PoseResNet inference with Pallas-fused backbone stages.

    Mirrors the float model's ``apply(variables, x, train=False)`` so
    PosePredictor / ClipTracker / the validation loop run it unchanged;
    ``variables`` is the tree from :func:`prepare_fused_variables`.
    Stem / deconv head / final conv stay on XLA (measured at or near their
    rooflines); only the bottleneck stages go through the fused kernels.
    """

    def __init__(self, model_cfg, use_pallas: bool = True,
                 interpret: bool = False):
        self.cfg = model_cfg
        self.use_pallas = use_pallas
        self.interpret = interpret

    def apply(self, variables, x, train: bool = False):
        assert not train, "fused model is inference-only"
        cfg = self.cfg
        x = x.astype(jnp.bfloat16)
        n = x.shape[0]

        # stem: folded conv1 + ReLU + maxpool (XLA)
        stem = variables["stem"]
        x = jax.lax.conv_general_dilated(
            x, stem["kernel"], (2, 2), [(3, 3)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jnp.maximum(x + stem["bias"], 0.0).astype(jnp.bfloat16)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])

        # fused bottleneck stages; batch padded to a power-of-two tile
        pad = (-n) % 8
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        for si, blocks in enumerate(variables["stages"]):
            x = fused_stage(x, blocks, 1 if si == 0 else 2,
                            use_pallas=self.use_pallas,
                            interpret=self.interpret)
        if pad:
            x = x[:n]

        # deconv head (folded ConvTranspose semantics) + final conv
        for i in range(cfg.num_deconv_layers):
            d = variables["head"][f"deconv{i}"]
            k = cfg.num_deconv_kernels[i]
            p = (k - 2) // 2
            x = jax.lax.conv_general_dilated(
                x, d["kernel"], (1, 1), [(k - 1 - p, k - 1 - p)] * 2,
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jnp.maximum(x + d["bias"], 0.0).astype(jnp.bfloat16)
        fin = variables["final"]
        fk = cfg.final_conv_kernel
        x = jax.lax.conv_general_dilated(
            x, fin["kernel"], (1, 1), [((fk - 1) // 2, (fk - 1) // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return (x + fin["bias"]).astype(jnp.float32)


def fuse_pose_model(model_cfg, variables, use_pallas: bool = True,
                    interpret: bool = False):
    """(flax variables) -> (adapter, fused variables). Bottleneck nets only."""
    block, _ = RESNET_SPECS[model_cfg.num_layers]
    if block != "bottleneck":
        raise ValueError("fused inference supports bottleneck ResNets "
                         "(50/101/152)")
    return (FusedPoseAdapter(model_cfg, use_pallas, interpret),
            prepare_fused_variables(variables, model_cfg.num_layers))
