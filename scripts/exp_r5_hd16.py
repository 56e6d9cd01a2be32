"""Round-5: HD D=320 and 16-direction numbers through the production
path, with an HD in-context stage breakdown (VERDICT #5/#3).

  - HD 720x1280 D=320 bf16 8-dir full pipeline + cumulative stages
  - SD 480x640 D=120 16-dir f32 full pipeline (dense path, Pout baked)
  - SD 16-dir bf16 (re-check the knight packed-pair regression)
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.ops import dense_sgm_stereo, InterpolationKernel
from libstevi_tpu.ops.box_pallas import box_cost_volume_fused_padded
from libstevi_tpu.ops import sgm_pallas_dhw as dhw
from libstevi_tpu.utils.profiling import device_timer

rng = np.random.default_rng(0)
Lh = jnp.asarray(rng.uniform(0, 1, (720, 1280)).astype(np.float32))
Rh = jnp.asarray(rng.uniform(0, 1, (720, 1280)).astype(np.float32))
Ls = jnp.asarray(rng.uniform(0, 1, (480, 640)).astype(np.float32))
Rs = jnp.asarray(rng.uniform(0, 1, (480, 640)).astype(np.float32))


def full(D, nd, dt):
    def fn(l, r):
        disp, _, _ = dense_sgm_stereo(
            MatchingFunction.ZNCC, l, r, 3, 3, D, P1=0.1, P2=0.5,
            n_directions=nd, cost_vol_radius=1,
            refine_kernel=InterpolationKernel.PARABOLA, cv_dtype=dt)
        return disp
    return fn


# HD cumulative stages (bf16, Dp=320)
H, W, D, Dp = 720, 1280, 320, 320
dt = jnp.bfloat16
isz = 2
Wp, Hl = 1280, 720


def hd_cv(l, r):
    return box_cost_volume_fused_padded(
        MatchingFunction.ZNCC, l, r, 3, 3, D, Dp, dt, negate=True,
        pout_bake=100.0, interpret=False)


def hd_both(l, r):
    a = hd_cv(l, r)
    return a, jnp.transpose(a, (2, 1, 0))


def hd_downup(l, r):
    a, b = hd_both(l, r)
    vb = 12 * 2**20
    rc_d = dhw._pick_rc(Dp, Wp, 3, vb, n_streams=2, itemsize=isz)
    rc_u = dhw._pick_rc(Dp, Wp, 3, vb, n_streams=3, itemsize=isz)
    kw = dict(ml=0, W_pout=W, P1=0.1, P2=0.5, Pout=100.0,
              interpret=False, knight=False, pout_baked=True)
    adj = dhw._rows_call(a, None, RC=rc_d, N1=H, X1=W, reverse=False,
                         diag=True, transposed=False, H_corner=H,
                         corner_stream=True, **kw)
    if rc_u is None:
        adj_u = dhw._rows_call(a, None, RC=rc_d, N1=H, X1=W, reverse=True,
                               diag=True, transposed=False, H_corner=H,
                               corner_stream=True, **kw)
        adj = adj + adj_u
    else:
        adj = dhw._rows_call(a, adj, RC=rc_u, N1=H, X1=W, reverse=True,
                             diag=True, transposed=False, H_corner=H,
                             corner_stream=True, **kw)
    return a, b, adj


def hd_T(l, r):
    a, b, adj = hd_downup(l, r)
    return a, b, jnp.transpose(adj, (2, 1, 0))


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


timers = {}
specs = [
    ("HD cv", hd_cv, (Lh, Rh)),
    ("HD cv+T", hd_both, (Lh, Rh)),
    ("HD +down+up", hd_downup, (Lh, Rh)),
    ("HD +T(adj)", hd_T, (Lh, Rh)),
    ("HD FULL bf16", full(320, 8, jnp.bfloat16), (Lh, Rh)),
    ("SD16 f32 FULL", full(120, 16, jnp.float32), (Ls, Rs)),
    ("SD16 bf16 FULL", full(120, 16, jnp.bfloat16), (Ls, Rs)),
    ("SD8 bf16 FULL", full(120, 8, jnp.bfloat16), (Ls, Rs)),
]
for nm, fn, args in specs:
    try:
        timers[nm] = device_timer(forced(fn), *args)
        print(f"[compiled] {nm}", flush=True)
    except Exception as e:
        print(f"[FAILED compile] {nm}: {str(e)[:300]}", flush=True)

res = {nm: [] for nm in timers}
for rep in range(3):
    for nm, t_fn in timers.items():
        t = t_fn(iters=10) * 1e3
        res[nm].append(t)
        print(f"  rep{rep} {nm:16s} {t:8.3f} ms", flush=True)
print("\n=== medians ===")
for nm in timers:
    print(f"{nm:18s} {float(np.median(res[nm])):8.3f} ms")
