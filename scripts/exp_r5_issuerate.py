"""Round-5 (VERDICT #7): measure the VPU dependent-op issue rate
directly, to calibrate the per-stage ops/row model in docs/PERF.md.

Kernel: R sequential "rows", each performing K dependent vector ops on
a (Dp, Xp) tile held in registers (add/min alternating, a dependent
chain like the SGM row recurrence).  Time vs K at fixed R gives
ns/op/tile; divide by tile vregs for cycles/vreg-op.  Run for f32 and
packed bf16 tiles at the flagship tile shapes.
"""
import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libstevi_tpu.utils.profiling import device_timer

R = 480          # sequential rows (like the down pass scan)


def _kernel(x_ref, o_ref, scr, *, K, Dp, Xp):
    base = x_ref[0]

    def row(_, c):
        # K dependent ops per "row" (unrolled); rows via fori_loop so
        # the Mosaic program stays small
        for k in range(K // 2):
            c = c + base
            c = jnp.minimum(c, base)
        return c * 0.5

    c = jax.lax.fori_loop(0, R, row, scr[...])
    o_ref[...] = c
    scr[...] = c


def make(K, Dp, Xp, dt):
    def fn(x):
        x3 = jnp.broadcast_to(x[:Dp, :Xp], (1, Dp, Xp)).astype(dt)
        return pl.pallas_call(
            functools.partial(_kernel, K=K, Dp=Dp, Xp=Xp),
            grid=(1,),
            in_specs=[pl.BlockSpec((1, Dp, Xp), lambda h: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((Dp, Xp), lambda h: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Dp, Xp), dt),
            scratch_shapes=[pltpu.VMEM((Dp, Xp), dt)],
            interpret=jax.default_backend() != "tpu")(x3)
    return fn


rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0.5, 1.0, (320, 1280)).astype(np.float32))

configs = [("f32 (128,640)", 128, 640, jnp.float32),
           ("bf16 (128,640)", 128, 640, jnp.bfloat16),
           ("f32 (128,480)", 128, 480, jnp.float32),
           ("bf16 (128,480)", 128, 480, jnp.bfloat16)]
K_LO, K_HI = 8, 64
timers = {}
for name, Dp, Xp, dt in configs:
    for K in (K_LO, K_HI):
        timers[(name, K)] = device_timer(
            lambda v, K=K, Dp=Dp, Xp=Xp, dt=dt: make(K, Dp, Xp, dt)(v), x)
        print(f"[compiled] {name} K={K}", flush=True)

res = {k: [] for k in timers}
for rep in range(5):
    for k, t_fn in timers.items():
        res[k].append(t_fn(iters=30))
for name, Dp, Xp, dt in configs:
    t_lo = float(np.median(res[(name, K_LO)]))
    t_hi = float(np.median(res[(name, K_HI)]))
    dt_per_op = (t_hi - t_lo) / (R * (K_HI - K_LO))
    isz = jnp.dtype(dt).itemsize
    vregs = Dp * Xp * isz / (8 * 128 * 4)
    cyc = dt_per_op * 0.94e9 / max(vregs, 1)   # v5e ~940 MHz
    print(f"{name:16s} t(K={K_LO}) {t_lo*1e3:7.3f} ms  t(K={K_HI}) "
          f"{t_hi*1e3:7.3f} ms  -> {dt_per_op*1e9:6.2f} ns/tile-op "
          f"({vregs:.0f} vregs, {cyc:.2f} cyc/vreg)", flush=True)
