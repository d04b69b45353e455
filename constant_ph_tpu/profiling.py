"""Profiling / tracing harness (SURVEY.md §5.1).

The reference's only introspection is memory_usage() reporting one buffer
(fix_constant_pH.cpp:314-318). Here: wall-clock step benchmarking with
block_until_ready, ns/day meters, XProf/Perfetto trace capture, and
per-component force timing.
"""
from __future__ import annotations

import contextlib
import time

import jax

from constant_ph_tpu import units


def benchmark_run(run_fn, state, *args, n_calls: int = 5, steps_per_call: int,
                  dt_fs: float, warmup: int = 2):
    """Time a compiled run function. Returns dict with ms/step and ns/day."""
    out = None
    for _ in range(warmup):
        out = run_fn(state, *args)
        state = out[0]
    jax.block_until_ready(jax.tree.leaves(state)[0])
    t0 = time.perf_counter()
    for _ in range(n_calls):
        out = run_fn(state, *args)
        state = out[0]
    jax.block_until_ready(jax.tree.leaves(state)[0])
    wall = time.perf_counter() - t0
    n_steps = n_calls * steps_per_call
    ms_per_step = 1e3 * wall / n_steps
    ns_day = (n_steps * dt_fs / units.FS_PER_NS) / (wall / 86400.0)
    return {"ms_per_step": ms_per_step, "ns_per_day": ns_day,
            "wall_s": wall, "steps": n_steps}


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XProf/Perfetto trace of the enclosed device work."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_components(fns: dict, *, n_calls: int = 10) -> dict:
    """Time a dict of nullary jitted thunks individually (ms each)."""
    out = {}
    for name, fn in fns.items():
        r = fn()
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n_calls):
            r = fn()
        jax.block_until_ready(r)
        out[name] = 1e3 * (time.perf_counter() - t0) / n_calls
    return out
