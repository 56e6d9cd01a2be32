"""SGM kernel variant experiments (round 2 perf work).

Times the individual fused passes and kernel variants on the flagship
(480, 640, 128) volume to find where the 5.2 ms goes.
"""
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

VOL_MB = H1 * Wp * Dp * 4 / 1e6


def timeit(name, fn, *args):
    t = device_time(fn, *args)
    print(f"{name:42s} {t*1e3:7.3f} ms   ({VOL_MB/819e3/t:5.1f}x vol-sweeps/s"
          f" equiv {3*VOL_MB*1e-3/819/t*100:5.1f}% of 3-sweep HBM)")
    return t


def rows_call(acc, reverse, diag, RC=4, kernel_fn=None, kwov=None):
    n_chunks = (H1 + RC - 1) // RC
    Hp = n_chunks * RC
    x = cv_p if Hp == H1 else jnp.pad(cv_p, ((0, Hp - H1), (0, 0), (0, 0)))
    spec_f = pl.BlockSpec((RC, Wp, Dp), lambda h: (h, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_r = pl.BlockSpec((RC, Wp, Dp), lambda h: (n_chunks - 1 - h, 0, 0),
                          memory_space=pltpu.VMEM)
    spec = spec_r if reverse else spec_f
    k = kernel_fn or sp._fused_rows_kernel
    kk = dict(kw, RC=RC, reverse=reverse, diag=diag,
              accumulate=acc is not None)
    if kwov:
        kk.update(kwov)
    kernel = functools.partial(k, **kk)
    scratch = [pltpu.VMEM((Wp, Dp), jnp.float32)] * (3 if diag else 1)
    in_specs = [spec] if acc is None else [spec, spec]

    def f(x_, *a):
        args = (x_,) + a
        return pl.pallas_call(
            kernel, grid=(n_chunks,), in_specs=in_specs, out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((Hp, Wp, Dp), jnp.float32),
            scratch_shapes=scratch,
            input_output_aliases={} if acc is None else {1: 0},
            interpret=False)(*args)

    if acc is None:
        return f, (x,)
    return f, (x, acc)


acc0 = jnp.zeros((480, Wp, Dp), jnp.float32)

# --- baseline pass times -----------------------------------------------
f, a = rows_call(None, False, True, RC=4)
t_down = timeit("rows down diag RC=4 (baseline)", f, *a)
f, a = rows_call(acc0, True, True, RC=4)
t_up = timeit("rows up diag acc RC=4 (baseline)", f, *a)
f, a = rows_call(None, False, False, RC=4)
timeit("rows down vertical-only RC=4", f, *a)

# --- RC sweep ----------------------------------------------------------
for rc in (2, 8):
    try:
        f, a = rows_call(None, False, True, RC=rc)
        timeit(f"rows down diag RC={rc}", f, *a)
    except Exception as e:
        print(f"RC={rc} failed: {type(e).__name__} {str(e)[:120]}")

# --- cols passes -------------------------------------------------------
RT, CC = 128, 8
nwc = Wp // CC
hspec_f = pl.BlockSpec((RT, CC, Dp), lambda r, w: (r, w, 0),
                       memory_space=pltpu.VMEM)
hspec_r = pl.BlockSpec((RT, CC, Dp), lambda r, w: (r, nwc - 1 - w, 0),
                       memory_space=pltpu.VMEM)
Hp128 = 512
cv_p128 = jnp.pad(cv_p, ((0, Hp128 - H1), (0, 0), (0, 0)))
acc128 = jnp.zeros((Hp128, Wp, Dp), jnp.float32)


def cols(x_, acc_, reverse):
    spec = hspec_r if reverse else hspec_f
    kernel = functools.partial(
        sp._fused_cols_kernel, CC=CC, Dp=Dp, W1=W1, ml=ml, W_pout=W1,
        P1=P1, P2=P2, Pout=Pout, reverse=reverse)
    return pl.pallas_call(
        kernel, grid=(Hp128 // RT, nwc), in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Hp128, Wp, Dp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((RT, Dp), jnp.float32)],
        input_output_aliases={1: 0}, interpret=False)(x_, acc_)


t_c = timeit("cols fwd", lambda x: cols(x, acc128, False), cv_p128)
timeit("cols rev", lambda x: cols(x, acc128, True), cv_p128)

print(f"\nbaseline total est: down {t_down*1e3:.2f} + up {t_up*1e3:.2f}"
      f" + 2x cols {2*t_c*1e3:.2f}")
