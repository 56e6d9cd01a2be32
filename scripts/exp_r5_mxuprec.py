"""Round-5: MXU-V precision decision — default (bf16-truncated inputs)
vs highest (bf16x6, ~f32-exact) vs VPU tree (None), measuring CV time,
FULL pipeline time, and disparity drift vs the f32 pipeline, all
interleaved in one window.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.ops import box_pallas as bp
from libstevi_tpu.ops import dense_sgm_stereo, InterpolationKernel
from libstevi_tpu.utils.profiling import device_timer

H, W, D = 480, 640, 120
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))


def make_full(prec, dt):
    def full(l, r):
        old = bp.MXU_V_PRECISION
        bp.MXU_V_PRECISION = prec
        try:
            disp, _, _ = dense_sgm_stereo(
                MatchingFunction.ZNCC, l, r, 3, 3, D, P1=0.1, P2=0.5,
                n_directions=8, cost_vol_radius=1,
                refine_kernel=InterpolationKernel.PARABOLA, cv_dtype=dt)
        finally:
            bp.MXU_V_PRECISION = old
        return disp
    return full


def make_cv(prec):
    def cv(l, r):
        old = bp.MXU_V_PRECISION
        bp.MXU_V_PRECISION = prec
        try:
            return bp.box_cost_volume_fused_padded(
                MatchingFunction.ZNCC, l, r, 3, 3, D, 128, jnp.bfloat16,
                negate=True, pout_bake=100.0, interpret=False)
        finally:
            bp.MXU_V_PRECISION = old
    return cv


df = np.asarray(jax.jit(make_full(None, jnp.float32))(img_l, img_r))
modes = [None, "default", "highest"]
for prec in modes:
    db = np.asarray(jax.jit(make_full(prec, jnp.bfloat16))(img_l, img_r))
    fin = np.isfinite(db) & np.isfinite(df)
    d = np.abs(db[fin] - df[fin])
    print(f"[drift vs f32] {str(prec):8s} mean {d.mean():.4f} "
          f"p99 {np.quantile(d, 0.99):.4f} max {d.max():.2f} "
          f"same_halfpx {(d <= 0.5).mean():.5f}", flush=True)


def forced(fn):
    def g(l, r):
        o = fn(l, r).astype(jnp.float32)
        return jnp.where(jnp.isfinite(o), o, 0.0).sum().reshape(1)
    return g


timers = {}
for prec in modes:
    timers[f"cv {prec}"] = device_timer(forced(make_cv(prec)),
                                        img_l, img_r)
    timers[f"full {prec}"] = device_timer(forced(make_full(
        prec, jnp.bfloat16)), img_l, img_r)
    print(f"[compiled] {prec}", flush=True)

res = {nm: [] for nm in timers}
for rep in range(4):
    for nm, t_fn in timers.items():
        t = t_fn(iters=40) * 1e3
        res[nm].append(t)
        print(f"  rep{rep} {nm:14s} {t:7.3f} ms", flush=True)
print("\n=== medians ===")
for nm in timers:
    print(f"{nm:16s} {float(np.median(res[nm])):7.3f} ms")
