"""SGM experiments 4: where do the cycles go in one scan step?

Variants of the cols kernel: full math / no-reduce / reduce-only / q-form /
bf16 tiles.
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

H1, W1, D = 480, 640, 120
Dp, Wp = 128, 640
rng = np.random.default_rng(0)
cv = jnp.asarray(rng.uniform(0, 1, (H1, W1, D)).astype(np.float32))
cv_p = jnp.pad(cv, ((0, 0), (0, 0), (0, Dp - D)), constant_values=jnp.inf)
cv_t = jnp.transpose(cv_p, (1, 0, 2))      # (W, H, D)

P1, P2, Pout = 0.1, 0.5, 100.0
_INF = float("inf")
RT, CW = 240, 8


def make_kernel(mode):
    def kernel(cv_ref, acc_ref, out_ref, carry_ref):
        w = pl.program_id(1)

        @pl.when(w == 0)
        def _():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        carry = carry_ref[:]
        for cc in range(CW):
            base = cv_ref[cc]
            if mode == "full":
                m = jnp.min(carry, axis=-1, keepdims=True)
                inf_col = jnp.full((RT, 1), _INF, jnp.float32)
                left = jnp.concatenate([inf_col, carry[:, :-1]], axis=-1)
                right = jnp.concatenate([carry[:, 1:], inf_col], axis=-1)
                agg = jnp.minimum(jnp.minimum(carry, m + P2),
                                  jnp.minimum(left, right) + P1)
                adj = agg - m
                carry = base + adj
                out_ref[cc] = acc_ref[cc] + adj
            elif mode == "noreduce":
                m = carry[:, :1]           # fake: no lane reduce
                inf_col = jnp.full((RT, 1), _INF, jnp.float32)
                left = jnp.concatenate([inf_col, carry[:, :-1]], axis=-1)
                right = jnp.concatenate([carry[:, 1:], inf_col], axis=-1)
                agg = jnp.minimum(jnp.minimum(carry, m + P2),
                                  jnp.minimum(left, right) + P1)
                adj = agg - m
                carry = base + adj
                out_ref[cc] = acc_ref[cc] + adj
            elif mode == "reduceonly":
                m = jnp.min(carry, axis=-1, keepdims=True)
                adj = carry - m
                carry = base + adj
                out_ref[cc] = acc_ref[cc] + adj
            elif mode == "qform":
                # carry is the clamped normalized q~ (min 0, <= P2);
                # base has pout pre-added (here: plain base)
                inf_col = jnp.full((RT, 1), _INF, jnp.float32)
                left = jnp.concatenate([inf_col, carry[:, :-1]], axis=-1)
                right = jnp.concatenate([carry[:, 1:], inf_col], axis=-1)
                g = jnp.minimum(carry, jnp.minimum(left, right) + P1)
                cur = base + g
                m = jnp.min(cur, axis=-1, keepdims=True)
                carry = jnp.minimum(cur - m, P2)
                out_ref[cc] = acc_ref[cc] + g
            elif mode == "noshift":
                m = jnp.min(carry, axis=-1, keepdims=True)
                agg = jnp.minimum(carry, m + P2)
                adj = agg - m
                carry = base + adj
                out_ref[cc] = acc_ref[cc] + adj
            elif mode == "copy":
                carry = base + carry
                out_ref[cc] = acc_ref[cc] + carry
        carry_ref[:] = carry
    return kernel


def run(mode, dtype=jnp.float32):
    nw = Wp // CW
    Hp = 480
    x = cv_t.astype(dtype)
    acc = jnp.zeros((Wp, Hp, Dp), dtype)
    spec = pl.BlockSpec((CW, RT, Dp), lambda r, w: (w, r, 0),
                        memory_space=pltpu.VMEM)
    kernel = make_kernel(mode)

    def f(x_):
        return pl.pallas_call(
            kernel, grid=(Hp // RT, nw), in_specs=[spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((Wp, Hp, Dp), dtype),
            scratch_shapes=[pltpu.VMEM((RT, Dp), dtype)],
            input_output_aliases={1: 0}, interpret=False)(x_, acc)
    t = device_time(f, x)
    print(f"colsT {mode:10s} {str(dtype.__name__):9s} {t*1e3:7.3f} ms")
    return t


run("copy")
run("reduceonly")
run("noshift")
run("noreduce")
run("full")
run("qform")
run("full", jnp.bfloat16)
run("qform", jnp.bfloat16)
