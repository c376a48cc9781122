"""FlowNetS perf attribution on the real chip — RESULTS (2026-08-17):

1. Batch sweep (PROBE_SWEEP=1; the finding that matters): the net is
   BATCH-bound, not lowering-bound — 32/64/128/256 pairs measured
   41.5 / 59.8 / 79.8 / 96.3 TFLOP/s (21 -> 49% of bf16 peak). The deep
   layers run at 8x6 / 4x3 spatial with 512-1024 channels; only a large
   batch fills the MXU there. BENCH_MATRIX b3 therefore benches at 256
   pairs (4 production clips).

2. Per-stage isolation (the default section) is NOT valid on this relay:
   the summed isolated stages measured 31.8 ms vs ~8 ms for the fused
   full net at the same batch — each isolated measurement is dominated by
   its per-iteration input-perturb + output-reduction epilogues (pure HBM
   traffic the fused net never pays). Kept runnable as the reproducible
   record of WHY no per-stage table is published for FlowNet.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_flownet.py
(PROBE_SWEEP=1 for the batch sweep only.)
"""

import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.probe_stages import measure  # noqa: E402
from flowtrack_tpu.models.flownet import ConvLeaky, _RefinementTrunk  # noqa: E402

B = int(os.environ.get("PROBE_PAIRS", "64"))
H, W = 256, 192
DT = jnp.bfloat16
ITERS = int(os.environ.get("PROBE_ITERS", "10"))

# (name, module, input (H, W, C))
ENCODER = [
    ("conv1_7x7s2_6to64", ConvLeaky(64, 7, 2, dtype=DT), (H, W, 6)),
    ("conv2_5x5s2_64to128", ConvLeaky(128, 5, 2, dtype=DT),
     (H // 2, W // 2, 64)),
    ("conv3_5x5s2_128to256", ConvLeaky(256, 5, 2, dtype=DT),
     (H // 4, W // 4, 128)),
    ("conv3_1_3x3_256", ConvLeaky(256, 3, 1, dtype=DT),
     (H // 8, W // 8, 256)),
    ("conv4_3x3s2_256to512", ConvLeaky(512, 3, 2, dtype=DT),
     (H // 8, W // 8, 256)),
    ("conv4_1_3x3_512", ConvLeaky(512, 3, 1, dtype=DT),
     (H // 16, W // 16, 512)),
    ("conv5_3x3s2_512", ConvLeaky(512, 3, 2, dtype=DT),
     (H // 16, W // 16, 512)),
    ("conv5_1_3x3_512", ConvLeaky(512, 3, 1, dtype=DT),
     (H // 32, W // 32, 512)),
    ("conv6_3x3s2_512to1024", ConvLeaky(1024, 3, 2, dtype=DT),
     (H // 32, W // 32, 512)),
    ("conv6_1_3x3_1024", ConvLeaky(1024, 3, 1, dtype=DT),
     (H // 64, W // 64, 1024)),
]


def flops_of(fn, *args):
    # single guarded implementation — a cost_analysis failure on the relay
    # must not abort the probe after its expensive compiles
    from bench import program_flops

    return program_flops(jax.jit(fn), *args)


def emit(name, ms, flops):
    print(json.dumps({
        "stage": name, "ms": round(ms, 3),
        "gflops": round(flops / 1e9, 2),
        "tflops_per_sec": round(flops / (ms / 1e3) / 1e12, 1),
    }), flush=True)


def batch_sweep():
    from flowtrack_tpu.models.flownet import FlowNetS, preprocess_pair

    rng = np.random.default_rng(0)
    net = FlowNetS(dtype=DT)
    for b in (32, 64, 128, 256):
        pairs = preprocess_pair(
            jnp.asarray(rng.uniform(0, 255, (b, H, W, 3)), jnp.float32),
            jnp.asarray(rng.uniform(0, 255, (b, H, W, 3)), jnp.float32))
        v = jax.jit(net.init, static_argnames="train")(
            jax.random.PRNGKey(0), pairs[:1], train=False)

        def fn(v, x):
            return net.apply(v, x, train=False)

        ms = measure(fn, v, pairs, perturb=1, iters=8)
        fl = flops_of(fn, v, pairs)
        print(json.dumps({
            "batch": b, "ms_per_pair": round(ms / b, 4),
            "pairs_per_s": round(b / (ms / 1e3), 1),
            "tflops_per_sec": round(fl / (ms / 1e3) / 1e12, 1),
        }), flush=True)


def main():
    if os.environ.get("PROBE_SWEEP") == "1":
        batch_sweep()
        return
    rng = np.random.default_rng(0)
    total_ms, total_fl = 0.0, 0.0
    for name, mod, (h, w, c) in ENCODER:
        x = jnp.asarray(rng.normal(0, 1, (B, h, w, c)), DT)
        variables = jax.jit(mod.init)(jax.random.PRNGKey(0), x)

        def fn(v, x, mod=mod):
            return mod.apply(v, x)

        ms = measure(fn, variables, x, perturb=1, iters=ITERS)
        fl = flops_of(fn, variables, x)
        emit(name, ms, fl)
        total_ms += ms
        total_fl += fl

    # refinement trunk at the matching skip shapes
    trunk = _RefinementTrunk(dtype=DT)
    skips = [jnp.asarray(rng.normal(0, 1, (B, H // s, W // s, ch)), DT)
             for s, ch in ((4, 128), (8, 256), (16, 512), (32, 512),
                           (64, 1024))]
    tv = jax.jit(trunk.init)(jax.random.PRNGKey(0), *skips)

    def tfn(v, s2, s3, s4, s5, s6):
        return trunk.apply(v, s2, s3, s4, s5, s6)

    ms = measure(tfn, tv, *skips, perturb=1, iters=ITERS)
    fl = flops_of(tfn, tv, *skips)
    emit("refinement_trunk", ms, fl)
    total_ms += ms
    total_fl += fl
    emit("TOTAL_stages_summed", total_ms, total_fl)


if __name__ == "__main__":
    main()
