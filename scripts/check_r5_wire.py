"""Round-5: validate the wired MXU-V bf16 builder end-to-end on TPU and
measure the new production pipeline (CV stage + full dense_sgm_stereo).

Also sanity-checks disparity parity: full-pipeline disparity with the
MXU-V builder vs the f32 pipeline on the same pair.
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
from libstevi_tpu.ops import box_pallas as _bp
from libstevi_tpu.ops.box_pallas import (box_cost_volume_fused_padded,
                                         box_fused_in_scope)
from libstevi_tpu.utils.profiling import device_timer

# This receipt reproduces the MID-ROUND state in which the MXU-V path
# was wired at default matmul precision (before the accuracy refutation
# flipped the production default back to None — see the module comment
# on MXU_V_PRECISION and scripts/exp_r5_parityprec.py).
_bp.MXU_V_PRECISION = "default"

H, W, D = 480, 640, 120
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

print("Hb pick bf16:", box_fused_in_scope(MatchingFunction.ZNCC, (H, W),
                                          3, 3, 128, jnp.bfloat16))
print("Hb pick f32 :", box_fused_in_scope(MatchingFunction.ZNCC, (H, W),
                                          3, 3, 120, jnp.float32))


def cv_bf16(l, r):
    return box_cost_volume_fused_padded(MatchingFunction.ZNCC, l, r, 3, 3,
                                        D, 128, jnp.bfloat16, negate=True,
                                        pout_bake=100.0, interpret=False)


def full_bf16(l, r):
    disp, _, _ = dense_sgm_stereo(
        MatchingFunction.ZNCC, l, r, 3, 3, D, P1=0.1, P2=0.5,
        n_directions=8, cost_vol_radius=1,
        refine_kernel=InterpolationKernel.PARABOLA, cv_dtype=jnp.bfloat16)
    return disp


def full_f32(l, r):
    disp, _, _ = dense_sgm_stereo(
        MatchingFunction.ZNCC, l, r, 3, 3, D, P1=0.1, P2=0.5,
        n_directions=8, cost_vol_radius=1,
        refine_kernel=InterpolationKernel.PARABOLA, cv_dtype=jnp.float32)
    return disp


# disparity parity bf16(MXU-V) vs f32 pipeline
db = np.asarray(jax.jit(full_bf16)(img_l, img_r))
df = np.asarray(jax.jit(full_f32)(img_l, img_r))
fin = np.isfinite(db) & np.isfinite(df)
diff = np.abs(db[fin] - df[fin])
print(f"disp parity bf16(mxu) vs f32: mean {diff.mean():.4f} "
      f"p99 {np.quantile(diff, 0.99):.4f} max {diff.max():.3f} "
      f"same_halfpx {(diff <= 0.5).mean():.5f}")


def forced(fn):
    def g(l, r):
        o = fn(l, r).astype(jnp.float32)
        return jnp.where(jnp.isfinite(o), o, 0.0).sum().reshape(1)
    return g


timers = {
    "cv bf16 (mxu, new)": device_timer(forced(cv_bf16), img_l, img_r),
    "FULL bf16 (new)": device_timer(forced(full_bf16), img_l, img_r),
    "FULL f32": device_timer(forced(full_f32), img_l, img_r),
}
res = {nm: [] for nm in timers}
for rep in range(5):
    for nm, t_fn in timers.items():
        t = t_fn(iters=40) * 1e3
        res[nm].append(t)
        print(f"  rep{rep} {nm:22s} {t:7.3f} ms", flush=True)
print("\n=== medians ===")
for nm in timers:
    print(f"{nm:24s} {float(np.median(res[nm])):7.3f} ms")
