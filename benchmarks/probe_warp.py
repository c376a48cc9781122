"""Dense-warp microbenchmark: XLA slice-gather vs the Pallas
shift-accumulate kernel (ops/warp.py).

Context: the FlowNet2 cascade's four full-resolution warps are its
documented throughput ceiling (XLA gather rate ~0.4G fetches/s on this
chip, round-2 measurement). The Pallas kernel's cost is DATA-DEPENDENT —
passes scale with each row block's integer displacement range — so this
probe measures three flow regimes at the cascade's working shape:

  * zero        — lower bound (4 passes/block: the 2x2 taps)
  * cascade     — a real FlowNetS forward's upsampled flow on noise
                  frames (the serving regime: smooth, small)
  * adversarial — i.i.d. uniform +-20 px (maximal per-block range; the
                  regime where shift-accumulate degrades toward / below
                  the XLA gather)

Timing = the in-jit amortized protocol (probe_stages.measure — the one
trustworthy protocol on this relay, CLAUDE.md). One JSON line per
(regime, impl).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.probe_stages import measure  # noqa: E402
from flowtrack_tpu.ops.warp import (resample2d, resample2d_pallas,  # noqa: E402
                                    resample2d_pallas_mm)


def flows(regime: str, n, h, w, rng):
    if regime == "zero":
        return jnp.zeros((n, h, w, 2), jnp.float32)
    if regime == "adversarial":
        return jnp.asarray(rng.uniform(-20, 20, (n, h, w, 2)), jnp.float32)
    # cascade: real flow statistics — FlowNetS (random weights) on noise
    # frames, x4 upsampled and div_flow-rescaled like the cascade glue
    from flowtrack_tpu.models.flownet import FlowNetS, preprocess_pair

    net = FlowNetS(dtype=jnp.float32)
    fh, fw = -(-h // 64) * 64, -(-w // 64) * 64
    f1 = rng.uniform(0, 255, (n, fh, fw, 3)).astype(np.float32)
    f2 = f1 + rng.normal(0, 6, f1.shape).astype(np.float32)
    x = preprocess_pair(jnp.asarray(f1), jnp.asarray(f2))
    v = jax.jit(net.init, static_argnames="train")(
        jax.random.PRNGKey(0), x[:1], train=False)
    q = jax.jit(lambda v, x: net.apply(v, x, train=False))(v, x)
    full = jax.image.resize(q * 20.0, (n, fh, fw, 2), "bilinear")
    return full[:, :h, :w]


def main() -> None:
    n = int(os.environ.get("PROBE_WARP_N", "8"))
    h = int(os.environ.get("PROBE_WARP_H", "384"))
    w = int(os.environ.get("PROBE_WARP_W", "288"))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-1, 1, (n, h, w, 3)), jnp.float32)

    for regime in ("zero", "cascade", "adversarial"):
        fl = flows(regime, n, h, w, rng)
        rng_span = float(jnp.abs(fl).max())
        for impl, fn in (("xla", lambda a, b: resample2d(a, b)),
                         ("pallas", lambda a, b: resample2d_pallas(a, b)),
                         ("pallas_mm",
                          lambda a, b: resample2d_pallas_mm(a, b)),
                         # v3: relu-form weight construction (the a_mat
                         # build, not the dots, dominates the kernel)
                         ("pallas_mm_v3",
                          lambda a, b: resample2d_pallas_mm(
                              a, b, relu_weights=True))):
            try:
                ms = measure(fn, img, fl, perturb=0)
                from flowtrack_tpu.ops.warp import _WARP_MM_CHUNK
                print(json.dumps({
                    "probe": "dense_warp", "impl": impl, "regime": regime,
                    "n": n, "h": h, "w": w, "max_abs_flow": round(rng_span, 2),
                    "mm_chunk": _WARP_MM_CHUNK,
                    "ms_per_batch": round(ms, 3),
                    "us_per_image": round(1e3 * ms / n, 1)}), flush=True)
            except Exception as e:  # noqa: BLE001 — report, keep probing
                s = str(e)
                i = s.lower().find("failed to compile")
                print(json.dumps({
                    "probe": "dense_warp", "impl": impl, "regime": regime,
                    "error": s[i:i + 300] if i >= 0 else s[:300]}),
                    flush=True)


if __name__ == "__main__":
    main()
