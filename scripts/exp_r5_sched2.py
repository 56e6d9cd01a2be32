"""Round-5 scheduling, round 2: more barrier placements on top of the
wired early-cv_T barrier (all variants include it via the production
path), plus an HD re-measure.

  V1 production (early cv_T barrier, wired)
  V2 + barrier pinning adj_T right after the up pass (inside a copy of
     the _run_dhw flow)
  V3 + barrier between the CV builder and the down pass AND adj_T pin
  HD production re-measure (the barrier now applies there too)
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
from libstevi_tpu.ops import dense_sgm_stereo, InterpolationKernel
from libstevi_tpu.ops import sgm_pallas_dhw as dhw
from libstevi_tpu.utils.profiling import device_timer

H, W, D = 480, 640, 120
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
Lh = jnp.asarray(rng.uniform(0, 1, (720, 1280)).astype(np.float32))
Rh = jnp.asarray(rng.uniform(0, 1, (720, 1280)).astype(np.float32))


def manual(adj_barrier, cv_barrier):
    """Reassemble the production chain with optional extra barriers."""
    def fn(l, r):
        cv_nat = box_cost_volume_fused_padded(
            MatchingFunction.ZNCC, l, r, 3, 3, D, 128, jnp.bfloat16,
            negate=True, pout_bake=100.0, interpret=False)
        cv_T = jnp.transpose(cv_nat, (2, 1, 0))
        cv_nat, cv_T = jax.lax.optimization_barrier((cv_nat, cv_T))
        kw = dict(ml=0, W_pout=W, P1=0.1, P2=0.5, Pout=100.0,
                  interpret=False, knight=False, pout_baked=True)
        if cv_barrier:
            (cv_nat,) = jax.lax.optimization_barrier((cv_nat,))
        adj = dhw._rows_call(cv_nat, None, RC=2, N1=H, X1=W,
                             reverse=False, diag=True, transposed=False,
                             H_corner=H, corner_stream=True, **kw)
        adj = dhw._rows_call(cv_nat, adj, RC=8, N1=H, X1=W,
                             reverse=True, diag=True, transposed=False,
                             H_corner=H, corner_stream=True, **kw)
        adj_T = jnp.transpose(adj, (2, 1, 0))
        if adj_barrier:
            cv_T, adj_T = jax.lax.optimization_barrier((cv_T, adj_T))
        adj_T = dhw._rows_call(cv_T, adj_T, RC=8, N1=W, X1=H,
                               reverse=False, diag=False, transposed=True,
                               H_corner=H, **kw)
        # final WTA via the fused kernel path on precomputed streams is
        # inside sgm_fused_wta_from_native; to keep ONE wta, hand off:
        res = dhw.sgm_fused_wta_from_native(
            cv_nat, cv_T, H, W, D, 0, W, 0.1, 0.5, 100.0, 8,
            wta_radius=1, interpret=False, pout_baked=True, refine=(3, 3))
        return res[2] + 0.0 * adj_T[0, 0, 0]
    return fn


def prod_sd(l, r):
    disp, _, _ = dense_sgm_stereo(
        MatchingFunction.ZNCC, l, r, 3, 3, D, P1=0.1, P2=0.5,
        n_directions=8, cost_vol_radius=1,
        refine_kernel=InterpolationKernel.PARABOLA, cv_dtype=jnp.bfloat16)
    return disp


def prod_hd(l, r):
    disp, _, _ = dense_sgm_stereo(
        MatchingFunction.ZNCC, l, r, 3, 3, 320, P1=0.1, P2=0.5,
        n_directions=8, cost_vol_radius=1,
        refine_kernel=InterpolationKernel.PARABOLA, cv_dtype=jnp.bfloat16)
    return disp


def forced(fn):
    def g(l, r):
        o = fn(l, r).astype(jnp.float32)
        return jnp.where(jnp.isfinite(o), o, 0.0).sum().reshape(1)
    return g


timers = {
    "SD production": device_timer(forced(prod_sd), img_l, img_r),
    "HD production": device_timer(forced(prod_hd), Lh, Rh),
}
print("[compiled]", flush=True)
res = {nm: [] for nm in timers}
for rep in range(4):
    for nm, t_fn in timers.items():
        it = 40 if nm.startswith("SD") else 10
        t = t_fn(iters=it) * 1e3
        res[nm].append(t)
        print(f"  rep{rep} {nm:14s} {t:8.3f} ms", flush=True)
print("\n=== medians ===")
for nm in timers:
    print(f"{nm:16s} {float(np.median(res[nm])):8.3f} ms")
