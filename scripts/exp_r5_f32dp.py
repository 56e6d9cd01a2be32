"""Round-5: falsify/confirm the microbenchmark's claim that f32
dependent tile-ops run ~3x the packed-bf16 per-vreg rate (suspect:
packed bf16 min is emulated).

  - isolated DOWN pass on an f32 volume vs the bf16 one (same geometry)
  - microbench chains: add-only vs min-only, f32 vs bf16
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

from libstevi_tpu.ops import sgm_pallas_dhw as dhw
from libstevi_tpu.utils.profiling import device_timer

H, W, D = 480, 640, 120
rng = np.random.default_rng(0)
vol32 = jnp.asarray(rng.uniform(0, 1, (H, 128, 640)).astype(np.float32))
vol16 = vol32.astype(jnp.bfloat16)
kw = dict(ml=0, W_pout=W, P1=0.1, P2=0.5, Pout=100.0, interpret=False,
          knight=False, pout_baked=True)


def down(v, rc):
    a = dhw._rows_call(v, None, RC=rc, N1=H, X1=W, reverse=False,
                       diag=True, transposed=False, H_corner=H,
                       corner_stream=True, **kw)
    return a.astype(jnp.float32).sum().reshape(1)


R = 480


def _chain_kernel(x_ref, o_ref, scr, *, K, mode):
    base = x_ref[0]

    def row(_, c):
        for k in range(K):
            c = c + base if mode == "add" else jnp.minimum(c + 1.0, base)
        return c * 0.5

    c = jax.lax.fori_loop(0, R, row, scr[...])
    o_ref[...] = c
    scr[...] = c


def chain(K, mode, dt):
    def fn(x):
        x3 = x[0:1].astype(dt)          # (1, 128, 640) plane of the vol
        return pl.pallas_call(
            functools.partial(_chain_kernel, K=K, mode=mode),
            grid=(1,),
            in_specs=[pl.BlockSpec((1, 128, 640), lambda h: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((128, 640), lambda h: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, 640), dt),
            scratch_shapes=[pltpu.VMEM((128, 640), dt)],
            interpret=jax.default_backend() != "tpu")(x3)
    return fn


timers = {
    "down bf16 rc2": (lambda v: down(v, 2), vol16),
    "down f32 rc2": (lambda v: down(v, 2), vol32),
    "down f32 rc4": (lambda v: down(v, 4), vol32),
}
for mode in ("add", "min"):
    for dtn, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        for K in (8, 64):
            timers[f"chain {mode} {dtn} K={K}"] = (chain(K, mode, dt),
                                                   vol32)

built = {}
for nm, (fn, arg) in timers.items():
    built[nm] = device_timer(fn, arg)
    print(f"[compiled] {nm}", flush=True)

res = {nm: [] for nm in built}
for rep in range(5):
    for nm, t_fn in built.items():
        res[nm].append(t_fn(iters=30) * 1e3)
print("\n=== medians ===", flush=True)
med = {nm: float(np.median(v)) for nm, v in res.items()}
for nm, v in med.items():
    print(f"{nm:24s} {v:7.3f} ms")
for mode in ("add", "min"):
    for dtn in ("f32", "bf16"):
        lo = med[f"chain {mode} {dtn} K=8"]
        hi = med[f"chain {mode} {dtn} K=64"]
        ns = (hi - lo) / (R * 56) * 1e6
        print(f"slope {mode} {dtn}: {ns:6.2f} ns/tile-op")
