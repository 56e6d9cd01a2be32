"""Round-5 baseline: in-context stage breakdown of the PRODUCTION
flagship pipeline (dense_sgm_stereo fast path: pout-baked bf16 native-
layout CV -> down/up -> T -> fwd -> rev+WTA+subpixel), measured in ONE
process (tunnel noise rule), cumulative-chain style.

Run: python -u scripts/prof_r5.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.ops.box_pallas import box_cost_volume_fused_padded
from libstevi_tpu.ops import sgm_pallas_dhw as dhw
from libstevi_tpu.ops import dense_sgm_stereo, InterpolationKernel
from libstevi_tpu.utils.profiling import device_timer

H, W, D = 480, 640, 120
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

dt = jnp.bfloat16
isz = 2
Dp = 128
Wp = 640
Hl = 480          # 8-aligned ragged lane extent (== H)

rc_down = dhw._pick_rc(Dp, Wp, 3, 12 * 2**20, n_streams=2, itemsize=isz)
rc_up = dhw._pick_rc(Dp, Wp, 3, 12 * 2**20, n_streams=3, itemsize=isz)
rc_fwd = dhw._pick_rc(Dp, Hl, 1, 12 * 2**20, n_streams=3, itemsize=isz)
kw = dict(ml=0, W_pout=W, P1=0.1, P2=0.5, Pout=100.0, interpret=False,
          knight=False, pout_baked=True)
print("rc", rc_down, rc_up, rc_fwd, flush=True)


def cv_nat(l, r):
    return box_cost_volume_fused_padded(MatchingFunction.ZNCC, l, r, 3, 3,
                                        D, Dp, dt, negate=True,
                                        pout_bake=100.0, interpret=False)


def s_cv(l, r):
    return cv_nat(l, r)


def s_both(l, r):
    a = cv_nat(l, r)
    return a, jnp.transpose(a, (2, 1, 0))


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


def s_fwd(l, r):
    a, b, adj = s_up(l, r)
    adj_T = jnp.transpose(adj, (2, 1, 0))
    adj_T = dhw._rows_call(b, adj_T, RC=rc_fwd, N1=W, X1=H,
                           reverse=False, diag=False, transposed=True,
                           H_corner=H, **kw)
    return a, b, adj_T


def s_full(l, r):
    disp, _, _ = dense_sgm_stereo(
        MatchingFunction.ZNCC, l, r, 3, 3, D, P1=0.1, P2=0.5,
        n_directions=8, cost_vol_radius=1,
        refine_kernel=InterpolationKernel.PARABOLA, cv_dtype=jnp.bfloat16)
    return disp


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


stages = [("cv_nat", s_cv), ("+cv_T", s_both), ("+down", s_down),
          ("+up", s_up), ("+T(adj)+fwd", s_fwd)]
fns = {name: forced(fn) for name, fn in stages}
fns["FULL pipeline"] = forced(s_full)

# compile everything first (ONCE per variant), then interleave timings
timers = {}
for name, fn in fns.items():
    timers[name] = device_timer(fn, img_l, img_r)
    print(f"[compiled] {name}", flush=True)

results = {name: [] for name in fns}
for rep in range(3):
    for name, t_fn in timers.items():
        t = t_fn(iters=30) * 1e3
        results[name].append(t)
        print(f"  rep{rep} {name:14s} {t:7.3f} ms", flush=True)

print("\n=== medians (interleaved, 3 reps x 30 iters) ===")
prev = 0.0
for name, _ in stages:
    t = float(np.median(results[name]))
    print(f"{name:14s} cum {t:7.3f} ms   stage {t - prev:7.3f} ms")
    prev = t
t = float(np.median(results["FULL pipeline"]))
print(f"{'FULL':14s} cum {t:7.3f} ms   [rev+WTA+tail = {t - prev:7.3f} ms]")
