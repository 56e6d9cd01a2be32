"""SGM experiments 3: transposed-layout horizontal pass."""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from libstevi_tpu.utils.profiling import device_time

H1, W1, D = 480, 640, 120
Dp, Wp = 128, 640
rng = np.random.default_rng(0)
cv = jnp.asarray(rng.uniform(0, 1, (H1, W1, D)).astype(np.float32))
cv_p = jnp.pad(cv, ((0, 0), (0, 0), (0, Dp - D)), constant_values=jnp.inf)
cv_t = jnp.transpose(cv_p, (1, 0, 2))      # (W, H, D)

P1, P2, Pout = 0.1, 0.5, 100.0
ml = 0

_INF = float("inf")


def _fused_step(prev, base, pout_add, P1, P2):
    m = jnp.min(prev, axis=-1, keepdims=True)
    inf_col = jnp.full(prev.shape[:-1] + (1,), _INF, jnp.float32)
    left = jnp.concatenate([inf_col, prev[:, :-1]], axis=-1)
    right = jnp.concatenate([prev[:, 1:], inf_col], axis=-1)
    agg = jnp.minimum(jnp.minimum(prev, m + P2),
                      jnp.minimum(left, right) + P1)
    adj = agg - m + pout_add
    return base + adj, adj


def _cols_t_kernel(*refs, CW, Dp, W1, ml, W_pout, P1, P2, Pout, reverse, RT):
    """Horizontal pass on the TRANSPOSED (W, H, D) volume: each column step
    reads a clean (RT, Dp) tile (H on sublanes, D on lanes) — no strided
    sublane extraction."""
    cv_ref, acc_ref, out_ref, carry_ref = refs
    w = pl.program_id(1)
    nw = pl.num_programs(1)

    @pl.when(w == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    dd = jax.lax.broadcasted_iota(jnp.int32, (RT, Dp), 1)
    b = (nw - 1 - w) if reverse else w
    carry = carry_ref[:]
    cols = range(CW - 1, -1, -1) if reverse else range(CW)
    for cc in cols:
        j = b * CW + cc
        base = cv_ref[cc]
        pout_add = jnp.where(ml + j + dd >= W_pout,
                             jnp.float32(Pout), jnp.float32(0.0))
        cur, adj = _fused_step(carry, base, pout_add, P1, P2)
        carry = jnp.where(j < W1, cur, 0.0)
        out_ref[cc] = acc_ref[cc] + adj
    carry_ref[:] = carry


def cols_t(RT, CW, reverse=False):
    nw = Wp // CW
    Hp = (H1 + RT - 1) // RT * RT
    x = cv_t if Hp == H1 else jnp.pad(cv_t, ((0, 0), (0, Hp - H1), (0, 0)))
    acc = jnp.zeros((Wp, Hp, Dp), jnp.float32)
    spec = pl.BlockSpec((CW, RT, Dp),
                        (lambda r, w: (nw - 1 - w, r, 0)) if reverse
                        else (lambda r, w: (w, r, 0)),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _cols_t_kernel, CW=CW, Dp=Dp, W1=W1, ml=ml, W_pout=W1,
        P1=P1, P2=P2, Pout=Pout, reverse=reverse, RT=RT)

    def f(x_):
        return pl.pallas_call(
            kernel, grid=(Hp // RT, nw), in_specs=[spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((Wp, Hp, Dp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((RT, Dp), jnp.float32)],
            input_output_aliases={1: 0}, interpret=False)(x_, acc)
    return f, (x,)


def timeit(name, fn, *args):
    t = device_time(fn, *args)
    print(f"{name:44s} {t*1e3:7.3f} ms")
    return t


for RT, CW in [(128, 8), (240, 8), (240, 16), (480, 8), (120, 32),
               (240, 32)]:
    vm = (6 * RT * CW * Dp * 4 + RT * Dp * 4) / 2**20
    if vm > 14:
        print(f"colsT RT={RT} CW={CW}: skip ({vm:.1f} MB)")
        continue
    try:
        f, a = cols_t(RT, CW)
        timeit(f"colsT fwd RT={RT} CW={CW} ({vm:.1f} MB)", f, *a)
    except Exception as e:
        print(f"colsT RT={RT} CW={CW} failed: {type(e).__name__} "
              f"{str(e)[:140]}")

# cost of the transposes themselves
def tr(x):
    return jnp.transpose(x, (1, 0, 2))
timeit("transpose (H,W,D)->(W,H,D)", tr, cv_p)
