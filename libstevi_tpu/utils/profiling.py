"""Profiling, tracing and roofline accounting.

SURVEY §5: the reference has no in-library tracing (only QBENCHMARK wall
time in `test/benchmarks/benchmarkStereoMatchingModels.cpp:353-357`); on
TPU this is a new subsystem: `jax.profiler` traces, device-chained timing
that is immune to host/tunnel round-trip latency, and XLA cost-analysis
based roofline accounting against the chip's HBM bandwidth and peak FLOPs.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax
import jax.numpy as jnp

# TPU v5e single-chip peaks (defaults; override per target chip).
# 394 TOPS is the INT8 figure; BF16 matmul peak is 197 TFLOP/s and f32
# runs at roughly half of that on the bf16-native MXU — mislabeling
# these a precision level high understates compute-bound roofline times
# ~2x and flips bound_by to "memory" for genuinely compute-bound ops.
V5E_HBM_BYTES_PER_S = 819e9
V5E_PEAK_OPS_INT8 = 394e12
V5E_PEAK_FLOPS_BF16 = 197e12
V5E_PEAK_FLOPS_F32 = 98.5e12


@contextlib.contextmanager
def trace(log_dir: str):
    """`jax.profiler` trace context; view with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(fn, *args, iters: int = 20) -> float:
    """Seconds per call of ``fn(*args)`` measured on-device.

    Iterations are serialized by a data dependency (each step folds an
    epsilon of the previous output back into the first argument) and the
    host syncs ONCE at the end, so dispatch latency and proxy/tunnel
    round-trips — where ``block_until_ready`` can even return without a
    real sync — are amortized away instead of polluting the measurement.
    The first argument must be a floating-point array."""
    x0, rest = args[0], args[1:]

    @jax.jit
    def chained(x, n):
        def body(_, xc):
            out = fn(xc, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return xc + 1e-12 * leaf.astype(xc.dtype).ravel()[0]
        return jax.lax.fori_loop(0, n, body, x)

    np.asarray(chained(x0, 1).ravel()[0])            # compile + sync
    t0 = time.perf_counter()
    np.asarray(chained(x0, 1).ravel()[0])
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(chained(x0, 1 + iters).ravel()[0])
    t2 = time.perf_counter() - t0
    # ops at/below timer resolution can yield a (noise) negative delta;
    # floor at 1 ns so callers can divide by the result
    return max((t2 - t1) / iters, 1e-9)


def device_timer(fn, *args):
    """Compile-once variant of `device_time` for repeated measurements:
    returns ``measure(iters) -> seconds/call`` over ONE pre-compiled
    device chain.  `device_time` builds (and compiles) a fresh jitted
    chain per call — ~30 s each through the remote compile service —
    so interleaved A/B loops must compile once and reuse."""
    x0, rest = args[0], args[1:]

    @jax.jit
    def chained(x, n):
        def body(_, xc):
            out = fn(xc, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return xc + 1e-12 * leaf.astype(xc.dtype).ravel()[0]
        return jax.lax.fori_loop(0, n, body, x)

    np.asarray(chained(x0, 1).ravel()[0])            # compile + sync

    def measure(iters: int = 20) -> float:
        t0 = time.perf_counter()
        np.asarray(chained(x0, 1).ravel()[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(chained(x0, 1 + iters).ravel()[0])
        t2 = time.perf_counter() - t0
        return max((t2 - t1) / iters, 1e-9)

    return measure


def cost_analysis(fn, *args) -> dict:
    """XLA's compiled cost analysis (flops, bytes accessed, ...) for
    ``jit(fn)(*args)``."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):                         # older jax versions
        ca = ca[0] if ca else {}
    return dict(ca or {})


def roofline(fn, *args, iters: int = 20,
             hbm_bytes_per_s: float = V5E_HBM_BYTES_PER_S,
             peak_flops: float = V5E_PEAK_FLOPS_F32) -> dict:
    """Measure ``fn`` and situate it on the roofline model.

    Returns flops/bytes from XLA cost analysis, the memory- and
    compute-bound time floors, the measured device time, the achieved
    fraction of the binding roofline, and which resource binds."""
    ca = cost_analysis(fn, *args)
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    t_mem = byts / hbm_bytes_per_s
    t_comp = flops / peak_flops
    t_bound = max(t_mem, t_comp)
    measured = device_time(fn, *args, iters=iters)
    return {
        "flops": flops,
        "bytes_accessed": byts,
        "arithmetic_intensity": flops / byts if byts else float("inf"),
        "memory_bound_s": t_mem,
        "compute_bound_s": t_comp,
        "measured_s": measured,
        "bound_by": "memory" if t_mem >= t_comp else "compute",
        "fraction_of_roofline": (t_bound / measured) if measured > 0
        else float("nan"),
    }
