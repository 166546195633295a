"""Benchmark / tracing harness.

The reference instruments each BFV phase with cudaEvent elapsed-time pairs
(demo.cu:18-20,275-296) and relied on nvprof externally.  The TPU
equivalents here:

* `time_fn` — amortized latency of a jitted function.  On this
  environment's tunneled TPU, per-dispatch overhead is O(10 ms), so a
  single wall-clock around one call measures the relay, not the chip; the
  standard fix (bench.py methodology) is to chain `inner` iterations inside
  one jit via lax.fori_loop and take the SLOPE between two inner counts.
* `trace` — a jax.profiler context writing an XPlane trace for offline
  roofline inspection (the nvprof analog).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def _sync(x) -> None:
    """Force completion.  A scalar fetch is relay-safe where
    block_until_ready is not (the tunnel acks dispatch, not completion)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = float(jnp.sum(jnp.ravel(leaf)[:1].astype(jnp.float64)))


def time_chained(make_step, x, inner_lo: int = 4, inner_hi: int = 16,
                 reps: int = 3) -> float:
    """Seconds per application of `fn`, dispatch overhead removed.

    `make_step(inner)` must return a jitted function chaining `inner`
    applications of the target onto its argument; latency is the slope
    ((t_hi - t_lo) / (inner_hi - inner_lo)) averaged over `reps`.
    """
    def timed(step):
        out = step(x)
        _sync(out)                       # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            out = step(x)
        _sync(out)
        return (time.perf_counter() - t0) / reps

    t_lo = timed(make_step(inner_lo))
    t_hi = timed(make_step(inner_hi))
    return max((t_hi - t_lo) / (inner_hi - inner_lo), 0.0)


def time_chained_dynamic(step, x, *extra, inner_lo: int = 4,
                         inner_hi: int = 16, reps: int = 3,
                         epochs: int = 3) -> float:
    """Like time_chained, but `step(x, inner, *extra)` takes the chain
    length as a TRACED scalar (lax.fori_loop with a dynamic trip count),
    so ONE compilation covers both inner counts — first TPU compiles
    cost 20-170 s through the relay tunnel, and the dynamic bound costs
    nothing (fori_loop lowers to a while either way).  `extra` pytrees
    are threaded as runtime buffer arguments (loop-invariant bundles:
    keeps big tables OUT of the compiled module's constants, which
    matters through the relay's upload limit).

    Returns the min-over-epochs slope (the relay adds heavy-tailed
    positive noise, so min is the right estimator)."""
    def timed(k):
        out = step(x, k, *extra)
        _sync(out)                       # compile (first epoch) + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            out = step(x, k, *extra)
        _sync(out)
        return (time.perf_counter() - t0) / reps

    k_lo = jnp.asarray(inner_lo, jnp.int32)
    k_hi = jnp.asarray(inner_hi, jnp.int32)
    # min PER POINT over epochs (noise is additive-positive on each
    # timing; a per-epoch slope can go negative and poison a min-of-
    # slopes), then one slope from the two minima.
    t_lo = min(timed(k_lo) for _ in range(epochs))
    t_hi = min(timed(k_hi) for _ in range(epochs))
    return max((t_hi - t_lo) / (inner_hi - inner_lo), 0.0)


def time_once(fn, *args, reps: int = 5) -> float:
    """Plain amortized wall-clock (compile excluded); fine on CPU, includes
    per-dispatch relay overhead on the tunneled TPU."""
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
