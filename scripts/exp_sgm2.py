"""SGM experiments 2: cols-pass RT/CC sweep, rows RC sweep."""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from libstevi_tpu.utils.profiling import device_time
from libstevi_tpu.ops import sgm_pallas as sp

H1, W1, D = 480, 640, 120
Dp, Wp = 128, 640
rng = np.random.default_rng(0)
cv = jnp.asarray(rng.uniform(0, 1, (H1, W1, D)).astype(np.float32))
cv_p = jnp.pad(cv, ((0, 0), (0, 0), (0, Dp - D)), constant_values=jnp.inf)

P1, P2, Pout = 0.1, 0.5, 100.0
ml = 0
kw = dict(Wp=Wp, Dp=Dp, H1=H1, W1=W1, ml=ml, W_pout=W1, P1=P1, P2=P2,
          Pout=Pout, with_carries=False, H_corner=H1)


def timeit(name, fn, *args):
    t = device_time(fn, *args)
    print(f"{name:44s} {t*1e3:7.3f} ms")
    return t


def cols_variant(RT, CC):
    nwc = Wp // CC
    Hp = (H1 + RT - 1) // RT * RT
    x = cv_p if Hp == H1 else jnp.pad(cv_p, ((0, Hp - H1), (0, 0), (0, 0)))
    acc = jnp.zeros((Hp, Wp, Dp), jnp.float32)
    spec = pl.BlockSpec((RT, CC, Dp), lambda r, w: (r, w, 0),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(
        sp._fused_cols_kernel, CC=CC, Dp=Dp, W1=W1, ml=ml, W_pout=W1,
        P1=P1, P2=P2, Pout=Pout, reverse=False)

    def f(x_):
        return pl.pallas_call(
            kernel, grid=(Hp // RT, nwc), in_specs=[spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((Hp, Wp, Dp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((RT, Dp), jnp.float32)],
            input_output_aliases={1: 0}, interpret=False)(x_, acc)
    return f, (x,)


for RT, CC in [(128, 8), (256, 8), (480, 4), (480, 8), (480, 16), (240, 8),
               (480, 2)]:
    vm = (6 * RT * CC * Dp * 4 + RT * Dp * 4) / 2**20
    if vm > 14:
        print(f"cols RT={RT} CC={CC}: skip ({vm:.1f} MB)")
        continue
    try:
        f, a = cols_variant(RT, CC)
        timeit(f"cols fwd RT={RT} CC={CC} ({vm:.1f} MB)", f, *a)
    except Exception as e:
        print(f"cols RT={RT} CC={CC} failed: {type(e).__name__} "
              f"{str(e)[:150]}")


def rows_call(reverse, diag, RC):
    n_chunks = (H1 + RC - 1) // RC
    Hp = n_chunks * RC
    x = cv_p if Hp == H1 else jnp.pad(cv_p, ((0, Hp - H1), (0, 0), (0, 0)))
    spec = pl.BlockSpec((RC, Wp, Dp),
                        (lambda h: (n_chunks - 1 - h, 0, 0)) if reverse
                        else (lambda h: (h, 0, 0)),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(sp._fused_rows_kernel, RC=RC, reverse=reverse,
                               diag=diag, accumulate=False, **kw)
    scratch = [pltpu.VMEM((Wp, Dp), jnp.float32)] * (3 if diag else 1)

    def f(x_):
        return pl.pallas_call(
            kernel, grid=(n_chunks,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((Hp, Wp, Dp), jnp.float32),
            scratch_shapes=scratch, interpret=False)(x_)
    return f, (x,)


for rc in (1, 2, 3, 4, 6):
    f, a = rows_call(False, True, rc)
    timeit(f"rows down diag RC={rc}", f, *a)
