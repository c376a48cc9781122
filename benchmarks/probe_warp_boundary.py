"""On-chip validation of the warp-kernel VMEM guard boundary.

Round-4 VERDICT item 5: the guard (_pallas_warp_supported) must admit
only shapes that actually compile and run within VMEM. This probe walks
the width axis to the guard's own boundary, compiles + runs the matmul
kernel at the LARGEST ADMITTED shape on the real chip, checks it against
the XLA gather, and confirms the first rejected shape transparently falls
back. Prints one JSON line per checked shape.

Usage (real chip):  python benchmarks/probe_warp_boundary.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from flowtrack_tpu.ops.warp import (_PALLAS_WARP_VMEM_CAP,
                                        _pallas_warp_supported,
                                        _pallas_warp_vmem_bytes, resample2d)

    bench.enable_compile_cache()
    rng = np.random.default_rng(0)
    h = int(os.environ.get("PROBE_H", "256"))

    w_rej = next(w for w in range(128, 8192, 128)
                 if not _pallas_warp_supported(
                     np.zeros((1, h, w, 3), np.float32)))
    w_adm = w_rej - 128
    shapes = [
        ("production_256x192", 256, 192),
        ("production_384x320", 384, 320),
        ("largest_admitted", h, w_adm),
    ]
    for label, sh, sw in shapes:
        img = rng.normal(size=(2, sh, sw, 3)).astype(np.float32)
        flow = rng.uniform(-20, 20, (2, sh, sw, 2)).astype(np.float32)
        want = np.asarray(jax.jit(resample2d)(jnp.asarray(img),
                                              jnp.asarray(flow)))
        got = np.asarray(jax.jit(
            lambda a, b: resample2d(a, b, use_pallas=True, matmul=True))(
                jnp.asarray(img), jnp.asarray(flow)))
        err = float(np.abs(got - want).max())
        tol = 4 * float(np.finfo(np.float32).eps) * float(np.abs(img).max())
        print(json.dumps({
            "experiment": "warp_vmem_boundary", "shape": label,
            "h": sh, "w": sw,
            "budget_mb": round(_pallas_warp_vmem_bytes(img) / 2**20, 2),
            "cap_mb": _PALLAS_WARP_VMEM_CAP // 2**20,
            "admitted": bool(_pallas_warp_supported(img)),
            "max_err": err, "ok": bool(err <= tol),
            "platform": jax.devices()[0].platform,
        }), flush=True)

    # first rejected shape: must FALL BACK (identical results, no crash)
    img = rng.normal(size=(1, h, w_rej, 3)).astype(np.float32)
    flow = rng.uniform(-20, 20, (1, h, w_rej, 2)).astype(np.float32)
    want = np.asarray(jax.jit(resample2d)(jnp.asarray(img),
                                          jnp.asarray(flow)))
    got = np.asarray(jax.jit(
        lambda a, b: resample2d(a, b, use_pallas=True, matmul=True))(
            jnp.asarray(img), jnp.asarray(flow)))
    print(json.dumps({
        "experiment": "warp_vmem_boundary", "shape": "first_rejected",
        "h": h, "w": w_rej,
        "budget_mb": round(_pallas_warp_vmem_bytes(img) / 2**20, 2),
        "admitted": False,
        "fallback_bitwise": bool(np.array_equal(got, want)),
        "ok": bool(np.array_equal(got, want)),
    }), flush=True)


if __name__ == "__main__":
    main()
