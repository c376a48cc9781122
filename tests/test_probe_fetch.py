"""benchmarks/probe_fetch.py strategies must be value-identical: the
committed fetch A/B (PROBE_FETCH_r05.jsonl) is only meaningful if
seq / async-batched / bitcast-packed return the same bytes — in
particular the packed strategy's uint32 bitcast round trip of f32,
int32, and bool leaves."""

import numpy as np

from benchmarks import probe_fetch
import jax


def test_fetch_strategies_bitwise_equal():
    ref = probe_fetch.fetch_seq(
        probe_fetch.leaves_on_device(jax.random.PRNGKey(7)))
    for fn in (probe_fetch.fetch_batched, probe_fetch.fetch_packed):
        got = fn(probe_fetch.leaves_on_device(jax.random.PRNGKey(7)))
        for a, b in zip(ref, got):
            a, b = np.asarray(a), np.asarray(b)
            assert a.dtype == b.dtype, fn.__name__
            assert np.array_equal(a, b), fn.__name__
