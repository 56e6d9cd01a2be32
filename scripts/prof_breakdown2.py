"""Round-2b profiling: per-stage breakdown of the flagship pipeline
(bf16 volume, DHW layout, fused box CV kernel)."""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction, ExtractionStrategy
from libstevi_tpu.ops import (unfold_based_cost_volume, sgm_wta_truncated,
                              refine_disp_cost_interpolation,
                              InterpolationKernel)
from libstevi_tpu.ops import sgm_pallas_dhw as dhw
from libstevi_tpu.utils.profiling import device_time

H, W, D = 480, 640, 120
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))


def cv_build(l, r):
    return unfold_based_cost_volume(MatchingFunction.ZNCC, l, r, 3, 3, D,
                                    backend="auto", layout="dhw",
                                    cv_dtype=jnp.bfloat16)


cv = jax.jit(cv_build)(img_l, img_r)
cv.block_until_ready()
print(f"CV build (fused box bf16, dhw): {device_time(cv_build, img_l, img_r)*1e3:.3f} ms")

# pad as _run_dhw does
H1, _, W1 = cv.shape
dt = cv.dtype
isz = jnp.dtype(dt).itemsize
sub = 16
Dp = dhw._round_up(D, sub)
Wp = dhw._round_up(W1, 128)
Hp = dhw._round_up(H1, 8)
Hp_lanes = dhw._round_up(H1, 128)
cv_p = jnp.pad(cv, ((0, 0), (0, Dp - D), (0, 0)), constant_values=jnp.inf)
cv_p = jnp.pad(cv_p, ((0, Hp - H1), (0, 0), (0, Wp - W1)))
cv_p = jax.block_until_ready(cv_p.astype(dt))

rc_down = dhw._pick_rc(Dp, Wp, 3, 12 * 2**20, n_streams=2, itemsize=isz)
rc_up = dhw._pick_rc(Dp, Wp, 3, 12 * 2**20, n_streams=3, itemsize=isz)
rc_fwd = dhw._pick_rc(Dp, Hp_lanes, 1, 12 * 2**20, n_streams=3, itemsize=isz)
print("rc:", rc_down, rc_up, rc_fwd)

kw = dict(ml=0, W_pout=W1, P1=0.1, P2=0.5, Pout=0.0, interpret=False,
          knight=False)


def down(c):
    return dhw._rows_call(c, None, RC=rc_down, N1=H1, X1=W1, reverse=False,
                          diag=True, transposed=False, H_corner=H1,
                          corner_stream=True, **kw)


adj = jax.block_until_ready(jax.jit(down)(cv_p))
print(f"down pass (3 carries): {device_time(down, cv_p)*1e3:.3f} ms")


def up(c):
    return dhw._rows_call(c, adj, RC=rc_up, N1=H1, X1=W1, reverse=True,
                          diag=True, transposed=False, H_corner=H1,
                          corner_stream=True, **kw)


print(f"up pass (3 carries + acc): {device_time(up, cv_p)*1e3:.3f} ms")
adj2 = jax.block_until_ready(jax.jit(up)(cv_p))


def to_T(x):
    xt = jnp.transpose(x[:H1, :, :], (2, 1, 0))
    return jnp.pad(xt, ((0, 0), (0, 0), (0, Hp_lanes - H1)))


print(f"transpose cv_p: {device_time(to_T, cv_p)*1e3:.3f} ms")
print(f"transpose adj:  {device_time(to_T, adj2)*1e3:.3f} ms")
cv_T = jax.block_until_ready(jax.jit(to_T)(cv_p))
adj_T = jax.block_until_ready(jax.jit(to_T)(adj2))


def both_T(c, a):
    return to_T(c), to_T(a)


print(f"both transposes together: {device_time(both_T, cv_p, adj2)*1e3:.3f} ms")


def fwd(ct, at):
    return dhw._rows_call(ct, at, RC=rc_fwd, N1=W1, X1=H1, reverse=False,
                          diag=False, transposed=True, H_corner=H1, **kw)


print(f"fwd-T pass (1 carry): {device_time(fwd, cv_T, adj_T)*1e3:.3f} ms")
adj_T2 = jax.block_until_ready(jax.jit(fwd)(cv_T, adj_T))


# time the full fused call for reference
def full_sgm(c):
    return dhw.sgm_fused_wta_dhw(c, 0, W1, 0.1, 0.5, 0.0, 8, wta_radius=1)


print(f"full sgm_fused_wta_dhw: {device_time(full_sgm, cv)*1e3:.3f} ms")


def full(l, r):
    c = cv_build(l, r)
    idx, tcv = sgm_wta_truncated(c, P1=0.1, P2=0.5, n_directions=8,
                                 strategy=ExtractionStrategy.SCORE,
                                 h_radius=3, v_radius=3, cost_vol_radius=1,
                                 layout="dhw")
    return refine_disp_cost_interpolation(InterpolationKernel.PARABOLA,
                                          tcv, idx)


t_full = device_time(full, img_l, img_r)
print(f"full pipeline: {t_full*1e3:.3f} ms  ({1/t_full:.1f} fps)")
