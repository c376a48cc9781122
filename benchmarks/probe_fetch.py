"""On-chip A/B of host-readback strategies for clip-tracker outputs.

The serving layer's per-step host fetch reads FIVE output leaves
(joints, maxvals, scores, ids, valid). On this machine every FORCED
readback rides the axon relay (~30 ms round trip, CLAUDE.md), so the
fetch strategy is a first-order term of the serving latency floor:

  seq    — np.asarray per leaf (the pre-r5 code): five serialized trips.
  batched — jax.device_get(leaves): copy_to_host_async on every leaf
            before awaiting any; trips overlap if the relay allows it.
  packed — ONE device buffer: leaves bitcast to uint32 and concatenated
            by a tiny jitted pack fn, one np.asarray, host-side views.

Prints one JSON line per strategy (ms per fetch, p50 over N rounds).
The production default follows the winner (serving._fetch /
ClipTracker.to_host use jax.device_get since r5g).
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

T = int(os.environ.get("PROBE_FETCH_T", "64"))      # frames per clip
S = int(os.environ.get("PROBE_FETCH_S", "18"))      # track slots
K = 17                                               # joints
N = int(os.environ.get("PROBE_FETCH_N", "30"))      # timed rounds


def leaves_on_device(key):
    ks = jax.random.split(key, 5)
    joints = jax.random.normal(ks[0], (T, S, K, 2), jnp.float32)
    maxvals = jax.random.uniform(ks[1], (T, S, K), jnp.float32)
    scores = jax.random.uniform(ks[2], (T, S), jnp.float32)
    ids = jax.random.randint(ks[3], (T, S), 0, 100, jnp.int32)
    valid = jax.random.uniform(ks[4], (T, S)) > 0.5
    leaves = (joints, maxvals, scores, ids, valid)
    jax.block_until_ready(leaves)
    return leaves


@jax.jit
def pack(joints, maxvals, scores, ids, valid):
    """All five leaves as ONE flat uint32 buffer (bitcast, lossless)."""
    parts = [jax.lax.bitcast_convert_type(joints, jnp.uint32).ravel(),
             jax.lax.bitcast_convert_type(maxvals, jnp.uint32).ravel(),
             jax.lax.bitcast_convert_type(scores, jnp.uint32).ravel(),
             jax.lax.bitcast_convert_type(ids, jnp.uint32).ravel(),
             valid.astype(jnp.uint32).ravel()]
    return jnp.concatenate(parts)


def unpack(buf):
    sizes = [T * S * K * 2, T * S * K, T * S, T * S, T * S]
    out, o = [], 0
    for n in sizes:
        out.append(buf[o:o + n])
        o += n
    joints = out[0].view(np.float32).reshape(T, S, K, 2)
    maxvals = out[1].view(np.float32).reshape(T, S, K)
    scores = out[2].view(np.float32).reshape(T, S)
    ids = out[3].view(np.int32).reshape(T, S)
    valid = out[4].astype(bool).reshape(T, S)
    return joints, maxvals, scores, ids, valid


def fetch_seq(leaves):
    return [np.asarray(x) for x in leaves]


def fetch_batched(leaves):
    return jax.device_get(list(leaves))


def fetch_packed(leaves):
    return unpack(np.asarray(pack(*leaves)))


def main():
    platform = jax.devices()[0].platform
    strategies = [("seq", fetch_seq), ("batched", fetch_batched),
                  ("packed", fetch_packed)]
    # correctness first: every strategy returns the same values
    ref = fetch_seq(leaves_on_device(jax.random.PRNGKey(0)))
    for name, fn in strategies[1:]:
        got = fn(leaves_on_device(jax.random.PRNGKey(0)))
        for a, b in zip(ref, got):
            assert np.array_equal(np.asarray(a), np.asarray(b)), name

    for name, fn in strategies:
        # fresh device values each round so no host cache can satisfy the
        # fetch; time ONLY the fetch (leaves are block_until_ready'd)
        lat = []
        for i in range(N + 3):
            leaves = leaves_on_device(jax.random.PRNGKey(i + 1))
            t0 = time.perf_counter()
            fn(leaves)
            dt = (time.perf_counter() - t0) * 1e3
            if i >= 3:
                lat.append(dt)
        a = np.asarray(lat)
        print(json.dumps({
            "probe": "fetch_strategy", "strategy": name,
            "t": T, "s": S, "rounds": N, "platform": platform,
            "p50_ms": round(float(np.percentile(a, 50)), 2),
            "p90_ms": round(float(np.percentile(a, 90)), 2),
            "mean_ms": round(float(a.mean()), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
