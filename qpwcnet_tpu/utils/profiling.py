"""Tracing / profiling harness (SURVEY.md §5 'Tracing / profiling').

TPU-native replacements for the reference's three profiling mechanisms
(Keras TensorBoard profile_batch, tf.summary.trace_on graph traces, and
TF1 RunMetadata memory profiling — app/util/show_network.py:56-62,
app/util/profile_memory.py:35-53):

  * :func:`trace` — jax.profiler context -> Perfetto/XProf trace dir;
  * :func:`time_fn` — block_until_ready wall-time harness;
  * :func:`cost_analysis` — XLA's own FLOP/bytes estimate of a jitted fn;
  * :func:`summarize_model` — parameter-count table (show_network.py
    model.summary() equivalent).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in XProf/TensorBoard-profile."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 2):
    """Median wall time of fn(*args) with block_until_ready.

    NOTE: on execution environments that result-cache identical device
    executions (the axon remote tunnel does), repeated identical calls
    measure cache hits, not compute — use :func:`time_fn_chained`.
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def time_fn_chained(fn: Callable, x0, iters: int = 10):
    """Wall time per call of a single-argument fn with a serial
    output->input dependency chain: x_{i+1} = x0 * (1 + eps(out_i)).
    Defeats async pipelining AND remote result caching. fn must accept
    and return (pytrees of) arrays; the feedback perturbation is a
    scalar derived from the output, so per-iteration overhead is tiny.
    """
    out = fn(x0)  # warmup/compile
    jax.block_until_ready(out)
    x = x0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
        leaf = jax.tree_util.tree_leaves(out)[0]
        # Multiplicative perturbation with a constant term >= 2^-7 so it
        # survives bf16 rounding — an additive 1e-6 epsilon rounds away
        # in bf16 inputs, making every iteration bit-identical and
        # letting the remote result cache fake ~400x speedups (observed).
        scale = 1.0 + 7.8e-3 * (
            1.0 + 0.1 * jnp.tanh(jnp.mean(leaf.astype(jnp.float32)))
        )
        x = jax.tree_util.tree_map(
            lambda a: (a * scale.astype(a.dtype)
                       if jnp.issubdtype(a.dtype, jnp.floating) else a),
            x,
        )
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters


def cost_analysis(fn: Callable, *args) -> dict:
    """XLA cost analysis (flops, bytes accessed) of a jittable fn."""
    lowered = jax.jit(fn).lower(*args)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return dict(analysis) if analysis else {}


def summarize_model(params, indent: int = 0) -> str:
    """Parameter-count tree summary (the model.summary() +
    plot_model role of app/util/show_network.py)."""
    lines = []

    def walk(tree, prefix, depth):
        if isinstance(tree, dict) or hasattr(tree, "items"):
            total = 0
            sub = []
            for k in sorted(tree.keys()):
                n, s = walk(tree[k], prefix + "/" + str(k), depth + 1)
                total += n
                sub.extend(s)
            sub.insert(0, f"{'  ' * depth}{prefix.split('/')[-1] or 'model'}"
                           f": {total:,}")
            return total, sub
        n = int(np.prod(tree.shape)) if hasattr(tree, "shape") else 1
        return n, [f"{'  ' * depth}{prefix.split('/')[-1]}: "
                   f"{tuple(tree.shape)} = {n:,}"]

    total, sub = walk(params, "", indent)
    lines.extend(sub)
    lines.append(f"TOTAL: {total:,} params")
    return "\n".join(lines)
