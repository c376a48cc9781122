"""Tracing/profiling (SURVEY.md section 6.1).

The reference only has AverageMeter batch timers; the TPU build adds:
  * ``trace(logdir)`` — jax.profiler trace context (XLA + Pallas TraceMe
    events, viewable in TensorBoard/Perfetto);
  * ``annotate(name)`` — TraceAnnotation for custom spans;
  * ``StageTimer`` — host-side per-stage wall timers with jsonl dump
    (detect / flow / pose / match breakdown in the tracker loop);
  * ``deterministic_guard`` — SURVEY.md section 6.2: XLA on TPU is
    deterministic by construction; this asserts the config knobs that could
    break bitwise run-to-run repeatability stay off.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def default_compile_cache_dir():
    """Shared ``--compile-cache`` default for every entry point.

    ``FLOWTRACK_COMPILE_CACHE`` wins when set (empty string = disabled);
    otherwise a repo-local ``.xla_compile_cache`` when running from a
    source checkout (same default ``bench.py`` uses — ADVICE round-3:
    the env var must behave uniformly across entry points), else None
    (disabled) for site-packages installs where the package dir may not
    be writable.
    """
    env = os.environ.get("FLOWTRACK_COMPILE_CACHE")
    if env is not None:
        return env or None
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if os.path.isdir(os.path.join(root, ".git")) or os.path.isfile(
            os.path.join(root, "pyproject.toml")):
        return os.path.join(root, ".xla_compile_cache")
    return None


def enable_compilation_cache(cache_dir: str,
                             min_compile_seconds: float = 1.0) -> None:
    """Persistent cross-process XLA compilation cache.

    Serving/eval CLIs recompile the same programs on every restart; on
    this machine a fresh-process TPU compile costs minutes (relay AOT
    warmup, CLAUDE.md), so the CLIs expose ``--compile-cache DIR`` (or the
    ``FLOWTRACK_COMPILE_CACHE`` env var) to persist compiled executables.
    The size floor is disabled so every program above
    ``min_compile_seconds`` caches regardless of binary size.
    """
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_seconds))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


class StageTimer:
    """Accumulate wall-time per named stage; device-sync aware.

    With ``sync=True`` the stage blocks until the device work it dispatched
    has actually finished, so the stage is charged its real cost instead of
    the ~0 ms async-dispatch time. The sync always drains the default
    device behind a tiny enqueued program (TPU executes programs in order;
    on this machine's relay ``block_until_ready`` on LARGE outputs can
    return early — CLAUDE.md — so the small-program drain is the reliable
    primitive). The context manager also yields a list: append the stage's
    device outputs (``with t.stage("pose") as out: out.append(f(x))``) to
    additionally await work on non-default devices.
    (``jax.effects_barrier()`` is NOT a device sync: it only awaits effect
    tokens, which pure jitted programs never create.)"""

    def __init__(self, sync: bool = False):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        outputs: list = []
        t0 = time.perf_counter()
        yield outputs
        if self.sync:
            if outputs:
                jax.block_until_ready(outputs)
            # ALWAYS also await a tiny enqueued program: this machine's
            # relay can return early from block_until_ready on LARGE
            # outputs (CLAUDE.md), and TPU executes programs in order per
            # device, so draining behind a small program is the reliable
            # sync either way; the outputs path still covers work on
            # non-default devices.
            jax.block_until_ready(jnp.zeros(()) + 0.0)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_ms": 1000.0 * self.totals[k] /
                               max(self.counts[k], 1)}
                for k in self.totals}

    def dump(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.summary(), indent=2, sort_keys=True)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s


def deterministic_guard():
    """Assert the determinism-relevant config (SURVEY.md section 6.2).

    TPU/XLA execution is deterministic given identical inputs and program;
    the knobs that could break it are host-side RNG reuse and async
    transfers racing donated buffers — neither exists in this framework's
    jit'd paths. This guard pins the expectation in code."""
    assert jax.config.jax_default_prng_impl in ("threefry2x32", "rbg"), (
        "non-counter-based PRNG would break replay determinism")
    return True
