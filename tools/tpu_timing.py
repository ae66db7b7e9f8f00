"""Loop-inside-jit timing for the TPU relay environment.

The relay adds ~20 ms of host round-trip per fetch and ``block_until_ready``
is not a trustworthy fence, so single-shot timings drown in noise.  Wrapping
the measured function in a ``lax.fori_loop`` of N dependent iterations inside
ONE jit amortizes the fetch latency: t = (T_fetch(N iters) - T_fetch(0)) / N.
Iterations are chained by adding ``1e-30 * carry`` to a float input, which
keeps XLA from hoisting the loop body without changing values measurably.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def loop_timer(fn, example_args, iters: int = 10, repeats: int = 3):
    """Return (ms_per_iter, checksum). ``fn(*args) -> array/pytree``; the first
    argument must be a float array (used for the dependency chain)."""

    def chained(args):
        def body(_, carry):
            csum, rest = carry
            first = rest[0] + 1e-30 * csum
            out = fn(first, *rest[1:])
            leaves = jax.tree_util.tree_leaves(out)
            csum = sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in leaves)
            return csum, rest

        csum, _ = jax.lax.fori_loop(
            0, iters, body, (jnp.float32(0.0), args)
        )
        return csum

    run = jax.jit(chained)
    c = float(run(example_args))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(example_args))
        times.append(time.perf_counter() - t0)

    # null fetch: the same machinery with zero iterations of work
    def null(args):
        return jnp.sum(args[0][..., 0]) * 0.0

    nrun = jax.jit(null)
    float(nrun(example_args))
    nulls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(nrun(example_args))
        nulls.append(time.perf_counter() - t0)

    ms = max(min(times) - min(nulls), 0.0) * 1e3 / iters
    return ms, c


def report(name, fn, *args, iters: int = 10):
    ms, c = loop_timer(fn, args, iters=iters)
    print(f"{name:44s} {ms:9.3f} ms/iter   (checksum {c:.4g})", flush=True)
    return ms
