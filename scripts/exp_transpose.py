"""Round-3 exp: what does the (H,D,W)->(W,D,H) relayout really cost, and
can a Pallas kernel beat XLA's transpose?

Honest timing: every variant ends in a Pallas reduce kernel (opaque to
XLA) that forces its input to be materialized in the expected layout;
the force kernel's own cost on an identical precomputed array is
measured and subtracted per variant.

Run one variant per invocation (remote compiles are slow/flaky):
    python -u scripts/exp_transpose.py <variant>
Variants: every key of VARIANTS (no argument runs them all).
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/libstevi_tpu_xla")
sys.path.insert(0, "/root/repo")

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libstevi_tpu.utils.profiling import device_time

H, D, W = 480, 128, 640
Hp = 512                      # lane-padded for the T layout
dt = jnp.bfloat16

rng = np.random.default_rng(0)
vol = jnp.asarray(rng.uniform(0, 1, (H, D, W)).astype(np.float32)).astype(dt)
vol2 = jnp.asarray(rng.uniform(0, 1, (H, D, W)).astype(np.float32)).astype(dt)


def _reduce_kernel(x_ref, o_ref):
    h = pl.program_id(0)

    @pl.when(h == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    s = jnp.sum(x_ref[...].astype(jnp.float32))
    o_ref[...] += s * jnp.ones((1, 8, 128), jnp.float32)


def force(x, rc=8):
    n0 = x.shape[0] // rc
    return pl.pallas_call(
        _reduce_kernel, grid=(n0,),
        in_specs=[pl.BlockSpec((rc,) + x.shape[1:], lambda h: (h, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda h: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.float32))(x)


def timed(name, make_out, variant, args=(None,)):
    """t(variant) - t(force(precomputed variant output))."""
    args = tuple(vol if a is None else a for a in args)
    print(f"[{name}] compiling output...", flush=True)
    out = jax.block_until_ready(jax.jit(make_out)(*args))
    print(f"[{name}] timing force...", flush=True)
    outs = out if isinstance(out, (tuple, list)) else (out,)
    t_force = sum(device_time(lambda o: force(o), o) for o in outs) * 1e3
    print(f"[{name}] timing full...", flush=True)
    t_full = device_time(variant, *args) * 1e3
    print(f"{name:44s} {t_full - t_force:7.3f} ms  "
          f"(full {t_full:.3f}, force {t_force:.3f})", flush=True)


def xla_T(v):
    yt = jnp.transpose(v, (2, 1, 0))
    return jnp.pad(yt, ((0, 0), (0, 0), (0, Hp - H)))


# Pallas block transpose, grid (W/bw, D/bd, Hp/bh)
def _t_kernel(x_ref, o_ref):
    o_ref[...] = jnp.transpose(x_ref[...], (2, 1, 0))


def _t2_kernel(x_ref, y_ref, o_ref, p_ref):
    o_ref[...] = jnp.transpose(x_ref[...], (2, 1, 0))
    p_ref[...] = jnp.transpose(y_ref[...], (2, 1, 0))


def make_pallas_T(bh, bd, bw, dual=False):
    def pallas_T(v, v2=None):
        vp = jnp.pad(v, ((0, Hp - H), (0, 0), (0, 0)))
        ispec = pl.BlockSpec((bh, bd, bw), lambda w, d, h: (h, d, w),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((bw, bd, bh), lambda w, d, h: (w, d, h),
                             memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct((W, D, Hp), dt)
        grid = (W // bw, D // bd, Hp // bh)
        if not dual:
            return pl.pallas_call(_t_kernel, grid=grid, in_specs=[ispec],
                                  out_specs=ospec, out_shape=oshape)(vp)
        v2p = jnp.pad(v2, ((0, Hp - H), (0, 0), (0, 0)))
        return pl.pallas_call(_t2_kernel, grid=grid,
                              in_specs=[ispec, ispec],
                              out_specs=[ospec, ospec],
                              out_shape=[oshape, oshape])(vp, v2p)
    return pallas_T


VARIANTS = {}
VARIANTS["xla"] = lambda: timed(
    "XLA transpose+pad (H,D,W)->(W,D,Hp)", xla_T, lambda v: force(xla_T(v)))
VARIANTS["moveaxis"] = lambda: timed(
    "XLA outer moveaxis (H,D,W)->(D,H,W)",
    lambda v: jnp.moveaxis(v, 0, 1),
    lambda v: force(jnp.moveaxis(v, 0, 1)))
for bh, bd, bw in [(128, 8, 128), (256, 8, 256), (128, 32, 128),
                   (512, 8, 640), (512, 16, 256), (256, 16, 128)]:
    f = make_pallas_T(bh, bd, bw)
    VARIANTS[f"pallas_{bh}_{bd}_{bw}"] = functools.partial(
        timed, f"pallas T blocks ({bh},{bd},{bw})", f,
        lambda v, f=f: force(f(v)))
f2 = make_pallas_T(256, 8, 256, dual=True)
VARIANTS["pallas2"] = lambda: timed(
    "pallas dual T (256,8,256)", f2,
    lambda v, w: (lambda a, b: force(a) + force(b))(*f2(v, w)),
    args=(None, vol2))


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for nm in names:
        try:
            VARIANTS[nm]()
        except Exception as e:
            print(f"{nm} failed: {str(e)[:200]}", flush=True)
