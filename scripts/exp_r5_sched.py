"""Round-5 last lever: does forcing the cv_T transpose's schedule
position (optimization_barrier) move the in-context pipeline?

  V1 baseline (XLA scheduler's choice)
  V2 cv_T forced AFTER the up pass (barrier ties cv_T to adj)
  V3 cv_T forced BEFORE the down pass (barrier ties down input to cv_T)
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
from libstevi_tpu.utils.profiling import device_timer

H, W, D = 480, 640, 120
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))


def pipe(mode):
    def fn(l, r):
        cv_nat = box_cost_volume_fused_padded(
            MatchingFunction.ZNCC, l, r, 3, 3, D, 128, jnp.bfloat16,
            negate=True, pout_bake=100.0, interpret=False)
        if mode == "late":
            # run down/up first, then materialize cv_T
            rc_d = 2
            rc_u = 8
            kw = dict(ml=0, W_pout=W, P1=0.1, P2=0.5, Pout=100.0,
                      interpret=False, knight=False, pout_baked=True)
            adj = dhw._rows_call(cv_nat, None, RC=rc_d, N1=H, X1=W,
                                 reverse=False, diag=True,
                                 transposed=False, H_corner=H,
                                 corner_stream=True, **kw)
            adj = dhw._rows_call(cv_nat, adj, RC=rc_u, N1=H, X1=W,
                                 reverse=True, diag=True,
                                 transposed=False, H_corner=H,
                                 corner_stream=True, **kw)
            cv_b, adj = jax.lax.optimization_barrier((cv_nat, adj))
            cv_T = jnp.transpose(cv_b, (2, 1, 0))
            adj_T = jnp.transpose(adj, (2, 1, 0))
            adj_T = dhw._rows_call(cv_T, adj_T, RC=8, N1=W, X1=H,
                                   reverse=False, diag=False,
                                   transposed=True, H_corner=H, **kw)
            res = dhw.sgm_fused_wta_from_native(
                cv_nat, cv_T, H, W, D, 0, W, 0.1, 0.5, 100.0, 8,
                wta_radius=1, interpret=False, pout_baked=True,
                refine=(3, 3))
            # NOTE: this recomputes everything inside — not comparable;
            # instead assemble manually like _run_dhw's tail would.
            return res[2]
        if mode == "early":
            cv_T0 = jnp.transpose(cv_nat, (2, 1, 0))
            cv_nat2, cv_T = jax.lax.optimization_barrier((cv_nat, cv_T0))
            res = dhw.sgm_fused_wta_from_native(
                cv_nat2, cv_T, H, W, D, 0, W, 0.1, 0.5, 100.0, 8,
                wta_radius=1, interpret=False, pout_baked=True,
                refine=(3, 3))
            return res[2]
        cv_T = jnp.transpose(cv_nat, (2, 1, 0))
        res = dhw.sgm_fused_wta_from_native(
            cv_nat, cv_T, H, W, D, 0, W, 0.1, 0.5, 100.0, 8,
            wta_radius=1, interpret=False, pout_baked=True,
            refine=(3, 3))
        return res[2]
    return fn


def forced(fn):
    def g(l, r):
        o = fn(l, r).astype(jnp.float32)
        return jnp.where(jnp.isfinite(o), o, 0.0).sum().reshape(1)
    return g


timers = {}
for mode in ("base", "early"):
    timers[mode] = device_timer(forced(pipe(mode)), img_l, img_r)
    print(f"[compiled] {mode}", flush=True)

res = {nm: [] for nm in timers}
for rep in range(5):
    for nm, t_fn in timers.items():
        t = t_fn(iters=40) * 1e3
        res[nm].append(t)
        print(f"  rep{rep} {nm:8s} {t:7.3f} ms", flush=True)
print("\n=== medians ===")
for nm in timers:
    print(f"{nm:10s} {float(np.median(res[nm])):7.3f} ms")
