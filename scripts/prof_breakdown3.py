"""Round-3 profiling: honest per-stage breakdown via cumulative prefixes.

`device_time` chains only out[0] back into the input, so pure-XLA stages
(transposes, moveaxis, pad) get dead-code-eliminated when measured in
isolation.  Here every prefix ends with a full-volume reduction (~0.1 ms,
cancels in stage differences), so each stage's real cost shows up.
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.ops import unfold_based_cost_volume
from libstevi_tpu.ops import sgm_pallas_dhw as dhw
from libstevi_tpu.utils.profiling import device_time

H, W, D = 480, 640, 120
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

dt = jnp.bfloat16
isz = 2
sub = 16
Dp = dhw._round_up(D, sub)
Wp = dhw._round_up(W, 128)
Hp = dhw._round_up(H, 8)
Hp_lanes = dhw._round_up(H, 128)

rc_down = dhw._pick_rc(Dp, Wp, 3, 12 * 2**20, n_streams=2, itemsize=isz)
rc_up = dhw._pick_rc(Dp, Wp, 3, 12 * 2**20, n_streams=3, itemsize=isz)
rc_fwd = dhw._pick_rc(Dp, Hp_lanes, 1, 12 * 2**20, n_streams=3, itemsize=isz)
kw = dict(ml=0, W_pout=W, P1=0.1, P2=0.5, Pout=0.0, interpret=False,
          knight=False)


def cv_pad(l, r):
    cv = unfold_based_cost_volume(MatchingFunction.ZNCC, l, r, 3, 3, D,
                                  backend="auto", layout="dhw", cv_dtype=dt)
    cv_p = jnp.pad(cv, ((0, 0), (0, Dp - D), (0, 0)),
                   constant_values=jnp.inf)
    return jnp.pad(cv_p, ((0, Hp - H), (0, 0), (0, Wp - W)))


def s_cv(l, r):
    return cv_pad(l, r)


def s_down(l, r):
    cv_p = cv_pad(l, r)
    adj = dhw._rows_call(cv_p, None, RC=rc_down, N1=H, X1=W, reverse=False,
                         diag=True, transposed=False, H_corner=H,
                         corner_stream=True, **kw)
    return cv_p, adj


def s_up(l, r):
    cv_p, adj = s_down(l, r)
    adj = dhw._rows_call(cv_p, adj, RC=rc_up, N1=H, X1=W, reverse=True,
                         diag=True, transposed=False, H_corner=H,
                         corner_stream=True, **kw)
    return cv_p, adj


def to_T(x):
    xt = jnp.transpose(x[:H, :, :], (2, 1, 0))
    return jnp.pad(xt, ((0, 0), (0, 0), (0, Hp_lanes - H)))


def s_transpose(l, r):
    cv_p, adj = s_up(l, r)
    return to_T(cv_p), to_T(adj)


def s_fwd(l, r):
    cv_T, adj_T = s_transpose(l, r)
    adj_T = dhw._rows_call(cv_T, adj_T, RC=rc_fwd, N1=W, X1=H,
                           reverse=False, diag=False, transposed=True,
                           H_corner=H, **kw)
    return cv_T, adj_T


def s_full(l, r):
    cv = unfold_based_cost_volume(MatchingFunction.ZNCC, l, r, 3, 3, D,
                                  backend="auto", layout="dhw", cv_dtype=dt)
    idx, bands = dhw.sgm_fused_wta_dhw(cv, 0, W, 0.1, 0.5, 0.0, 8,
                                       wta_radius=1)
    return idx, bands


def forced(fn):
    def g(l, r):
        outs = fn(l, r)
        return sum(o.astype(jnp.float32).sum() for o in
                   jax.tree_util.tree_leaves(outs)).reshape(1)
    return g


stages = [("cv+pad", s_cv), ("+down", s_down), ("+up", s_up),
          ("+2 transposes", s_transpose), ("+fwd-T", s_fwd)]
prev = 0.0
for name, fn in stages:
    t = device_time(forced(fn), img_l, img_r) * 1e3
    print(f"{name:16s} cum {t:7.3f} ms   stage {t - prev:7.3f} ms")
    prev = t

t = device_time(forced(s_full), img_l, img_r) * 1e3
print(f"{'full (wta fused)':16s} cum {t:7.3f} ms   "
      f"[rev-T+WTA = full - fwd-prefix = {t - prev:7.3f} ms]")
