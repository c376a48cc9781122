"""Per-stage perf probes for the pose backbone on the real chip.

This is the measurement harness behind the round-2 perf-falsification
write-ups (STATUS.md, ops/fused_resnet.py docstring). It times, at the
production batch (64-frame clip x 8 persons x flip = 1024 crops):

  * each ResNet-50 stage under plain XLA (the production path),
  * the Pallas fused-stage kernel (ops/fused_resnet.py),
  * the space-to-depth stem rewrite,
  * the MXU/matmul ceiling (dependent relu-matmul chain),

printing one JSON line per measurement.

MEASUREMENT PROTOCOL (matters on this machine): the axon relay does NOT
reliably block in ``jax.block_until_ready`` for programs with large
outputs — timing loops around such calls report dispatch time, off by up
to 60x (verified: a batch-1024 ResNet-50 forward "measured" 1.04ms that
way; truth is ~101ms). Every timing here therefore runs N iterations
INSIDE one jit (lax.fori_loop with a scalar accumulator dependency) and
forces the scalar out with float(...), which cannot complete before the
program does. Per-op one-shot timings through the relay also jitter by up
to 10x run-to-run; the amortized loop washes that out.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_stages.py
(~15 min: several multi-minute Mosaic compiles are part of the story).
Set PROBE_SECTIONS=xla,matmul to skip the slow-to-compile Pallas sections.
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from flowtrack_tpu.models.pose_resnet import Bottleneck
from flowtrack_tpu.models.layers import (batch_norm, conv,
                                         max_pool_same_as_torch)

B = int(os.environ.get("PROBE_BATCH", "1024"))
N = int(os.environ.get("PROBE_ITERS", "10"))
DT = jnp.bfloat16
SECTIONS = os.environ.get("PROBE_SECTIONS", "xla,matmul,fused,s2d").split(",")


def measure(apply_fn, *args, perturb=0, iters=None):
    """ms per application, amortized over ``iters`` (default PROBE_ITERS)
    in-jit iterations; the +i perturbation of args[perturb] defeats
    loop-invariant hoisting. Accumulates over ALL output leaves, so
    tuple/dict-returning fns work. THE one trustworthy timing protocol on
    this machine (module docstring) — bench.py delegates here too."""
    n_it = iters or N

    def looped(*a):
        def body(i, acc):
            aa = list(a)
            aa[perturb] = aa[perturb] + i * jnp.asarray(
                1e-6, aa[perturb].dtype)
            out = apply_fn(*aa)
            return acc + sum(
                jnp.abs(x).sum().astype(jnp.float32)
                for x in jax.tree_util.tree_leaves(out))
        return jax.lax.fori_loop(0, n_it, body, jnp.float32(0))

    f = jax.jit(looped)
    _ = float(f(*args))
    ts = []
    for r in range(2):
        a = list(args)
        a[perturb] = a[perturb] + r
        t0 = time.perf_counter()
        _ = float(f(*a))
        ts.append(time.perf_counter() - t0)
    return 1e3 * min(ts) / n_it


class Stem(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = conv(64, 7, 2, 3, dtype=DT, name="conv1")(x)
        x = batch_norm(False, DT, name="bn1")(x)
        x = nn.relu(x)
        return max_pool_same_as_torch(x, 3, 2, 1)


class Stage(nn.Module):
    features: int
    num_blocks: int
    strides: int

    @nn.compact
    def __call__(self, x):
        for b in range(self.num_blocks):
            x = Bottleneck(features=self.features,
                           strides=self.strides if b == 0 else 1,
                           downsample=b == 0, dtype=DT,
                           name=f"b{b}")(x, False)
        return x


STAGES = [
    ("layer1_x3", Stage(64, 3, 1), (B, 64, 48, 64), 64, 1),
    ("layer2_x4", Stage(128, 4, 2), (B, 64, 48, 256), 128, 2),
    ("layer3_x6", Stage(256, 6, 2), (B, 32, 24, 512), 256, 2),
    ("layer4_x3", Stage(512, 3, 2), (B, 16, 12, 1024), 512, 2),
]


def run_xla(rng, rngk):
    x = jnp.asarray(rng.normal(0, 1, (B, 256, 192, 3)), DT)
    stem = Stem()
    v = jax.jit(stem.init)(rngk, x[:1])
    ms = measure(lambda v, x: stem.apply(v, x), v, x, perturb=1)
    print(json.dumps({"probe": "xla", "stage": "stem", "ms": round(ms, 2)}))
    for name, mod, shape, _, _ in STAGES:
        x = jnp.asarray(rng.normal(0, 1, shape), DT)
        v = jax.jit(mod.init)(rngk, x[:1])
        ms = measure(lambda v, x, mod=mod: mod.apply(v, x), v, x, perturb=1)
        print(json.dumps({"probe": "xla", "stage": name,
                          "ms": round(ms, 2)}))


def run_matmul_ceiling(rng):
    w = jnp.asarray(rng.normal(0, 0.02, (4096, 4096)), DT)
    x = jnp.asarray(rng.normal(0, 1, (4096, 4096)), DT)
    reps = 64

    def chain(x, w):
        def body(i, y):
            return jnp.maximum(y @ w, 0) * 0.01
        return jax.lax.fori_loop(0, reps, body, x)

    ms = measure(lambda x, w: chain(x, w), x, w) / reps
    tflops = 2 * 4096 ** 3 / ms / 1e9
    print(json.dumps({"probe": "matmul_ceiling", "ms_per_matmul":
                      round(ms, 3), "tflops": round(tflops, 1)}))


def _fold_blocks(params, stats, nb):
    from flowtrack_tpu.models.quantize import _fold
    from flowtrack_tpu.ops.fused_resnet import block_from_folded
    blocks = []
    for bi in range(nb):
        bp, bs = params[f"b{bi}"], stats[f"b{bi}"]
        node = {}
        for ci in ("conv1", "conv2", "conv3"):
            bn = "bn" + ci[-1]
            k, b = _fold(bp[ci]["kernel"], {**bp[bn], **bs[bn]})
            node[ci] = {"kernel": k, "bias": b}
        if "downsample_conv" in bp:
            k, b = _fold(bp["downsample_conv"]["kernel"],
                         {**bp["downsample_bn"], **bs["downsample_bn"]})
            node["downsample_conv"] = {"kernel": k, "bias": b}
        blocks.append(block_from_folded(node))
    return blocks


def run_fused(rng, rngk):
    from flowtrack_tpu.ops.fused_resnet import fused_stage_pallas
    for name, mod, shape, _, stride in STAGES:
        x = jnp.asarray(rng.normal(0, 1, shape), DT)
        v = jax.jit(mod.init)(rngk, x[:1])
        blocks = _fold_blocks(v["params"], v["batch_stats"],
                              mod.num_blocks)
        # weights go through as ARGUMENTS (CLAUDE.md: closed-over weights
        # become program constants and can trip the relay's 100MB limit)
        ms = measure(
            lambda x, blocks, stride=stride:
            fused_stage_pallas(x, blocks, stride), x, blocks)
        print(json.dumps({"probe": "pallas_fused", "stage": name,
                          "ms": round(ms, 2)}))


def run_s2d(rng):
    x = jnp.asarray(rng.normal(0, 1, (B, 256, 192, 3)), DT)
    w7 = jnp.asarray(rng.normal(0, 0.05, (7, 7, 3, 64)), jnp.float32)

    def pool(y):
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])

    def stem(x, w):
        y = jax.lax.conv_general_dilated(
            x, w.astype(DT), (2, 2), [(3, 3)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return pool(jnp.maximum(y, 0))

    def stem_s2d(x, w):
        n, h, wd, c = x.shape
        xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
        hp, wp = h + 8, wd + 8
        z = xp.reshape(n, hp // 2, 2, wp // 2, 2, c)
        z = z.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // 2, wp // 2,
                                                  4 * c)
        w8 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
        w4 = w8.reshape(4, 2, 4, 2, c, -1).transpose(0, 2, 1, 3, 4, 5)
        w4 = w4.reshape(4, 4, 4 * c, -1)
        y = jax.lax.conv_general_dilated(
            z.astype(DT), w4.astype(DT), (1, 1), [(0, 0)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return pool(jnp.maximum(y[:, :h // 2, :wd // 2], 0))

    for name, f in (("stem_direct", stem), ("stem_s2d", stem_s2d)):
        ms = measure(f, x, w7)
        print(json.dumps({"probe": "s2d", "stage": name,
                          "ms": round(ms, 2)}))


def main():
    rng = np.random.default_rng(0)
    rngk = jax.random.PRNGKey(0)
    if "xla" in SECTIONS:
        run_xla(rng, rngk)
    if "matmul" in SECTIONS:
        run_matmul_ceiling(rng)
    if "fused" in SECTIONS:
        run_fused(rng, rngk)
    if "s2d" in SECTIONS:
        run_s2d(rng)


if __name__ == "__main__":
    main()
