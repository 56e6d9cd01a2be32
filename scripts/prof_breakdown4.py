"""Round-4 profiling: per-stage breakdown of the native-layout pipeline."""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.ops.box_pallas import (box_cost_volume_fused_padded,
                                         box_cost_volume_fused_T)
from libstevi_tpu.ops import sgm_pallas_dhw as dhw
from libstevi_tpu.utils.profiling import device_time

H, W, D = 480, 640, 120
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

dt = jnp.bfloat16
isz = 2
Dp = 128
Wp = 640
Hp = 480
Hl = 512

rc_down = dhw._pick_rc(Dp, Wp, 3, 12 * 2**20, n_streams=2, itemsize=isz)
rc_up = dhw._pick_rc(Dp, Wp, 3, 12 * 2**20, n_streams=3, itemsize=isz)
rc_fwd = dhw._pick_rc(Dp, Hl, 1, 12 * 2**20, n_streams=3, itemsize=isz)
kw = dict(ml=0, W_pout=W, P1=0.1, P2=0.5, Pout=100.0, interpret=False,
          knight=False)
print("rc", rc_down, rc_up, rc_fwd)


def cv_nat(l, r):
    return box_cost_volume_fused_padded(MatchingFunction.ZNCC, l, r, 3, 3,
                                        D, Dp, dt, negate=True,
                                        interpret=False)


def cv_T(l, r):
    return box_cost_volume_fused_T(MatchingFunction.ZNCC, l, r, 3, 3,
                                   D, Dp, dt, negate=True, interpret=False)


def s_both(l, r):
    return cv_nat(l, r), cv_T(l, r)


def s_down(l, r):
    a, b = s_both(l, r)
    adj = dhw._rows_call(a, None, RC=rc_down, N1=H, X1=W, reverse=False,
                         diag=True, transposed=False, H_corner=H,
                         corner_stream=True, **kw)
    return a, b, adj


def s_up(l, r):
    a, b, adj = s_down(l, r)
    adj = dhw._rows_call(a, adj, RC=rc_up, N1=H, X1=W, reverse=True,
                         diag=True, transposed=False, H_corner=H,
                         corner_stream=True, **kw)
    return a, b, adj


def to_T(x):
    xt = jnp.transpose(x[:H, :, :], (2, 1, 0))
    return jnp.pad(xt, ((0, 0), (0, 0), (0, Hl - H)))


def s_fwd(l, r):
    a, b, adj = s_up(l, r)
    adj_T = to_T(adj)
    adj_T = dhw._rows_call(b, adj_T, RC=rc_fwd, N1=W, X1=H,
                           reverse=False, diag=False, transposed=True,
                           H_corner=H, **kw)
    return a, b, adj_T


def s_full(l, r):
    a = cv_nat(l, r)
    b = cv_T(l, r)
    return dhw.sgm_fused_wta_from_native(a, b, H, W, D, 0, W, 0.1, 0.5,
                                         100.0, 8, wta_radius=1,
                                         interpret=False)


def forced(fn):
    def g(l, r):
        outs = fn(l, r)
        tot = None
        for o in jax.tree_util.tree_leaves(outs):
            v = jnp.where(jnp.isfinite(o.astype(jnp.float32)),
                          o.astype(jnp.float32), 0.0).sum()
            tot = v if tot is None else tot + v
        return tot.reshape(1)
    return g


stages = [("cv_nat", lambda l, r: cv_nat(l, r)),
          ("cv_T alone", lambda l, r: cv_T(l, r)),
          ("both CVs", s_both), ("+down", s_down), ("+up", s_up),
          ("+T(adj)+fwd", s_fwd)]
prev = 0.0
for name, fn in stages:
    t = device_time(forced(fn), img_l, img_r) * 1e3
    print(f"{name:14s} cum {t:7.3f} ms   stage {t - prev:7.3f} ms")
    if name not in ("cv_nat", "cv_T alone"):
        prev = t
    elif name == "cv_T alone":
        pass
    else:
        prev = t

t = device_time(forced(s_full), img_l, img_r) * 1e3
print(f"{'full fused':14s} cum {t:7.3f} ms   [wta = {t - prev:7.3f} ms]")
