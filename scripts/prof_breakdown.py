"""Round-2 profiling: per-stage breakdown of the flagship pipeline."""
import numpy as np
import jax
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction, ExtractionStrategy
from libstevi_tpu.ops import (unfold_based_cost_volume, sgm_wta_truncated,
                              refine_disp_cost_interpolation,
                              InterpolationKernel)
from libstevi_tpu.ops.sgm_pallas import sgm_fused_adj
from libstevi_tpu.utils.profiling import device_time, cost_analysis

H, W, D = 480, 640, 120
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))


def cv_build(l, r):
    return unfold_based_cost_volume(MatchingFunction.ZNCC, l, r, 3, 3, D,
                                    backend="box")


cv = jax.jit(cv_build)(img_l, img_r)
cv.block_until_ready()
t_cv = device_time(cv_build, img_l, img_r)
print(f"CV build (box ZNCC): {t_cv*1e3:.3f} ms")

ml = 0


def sgm_only(c):
    return sgm_fused_adj(c, 0, W, 0.1, 0.5, Pout=0.0, n_directions=8)


t_sgm = device_time(sgm_only, cv)
print(f"sgm_fused_adj (no WTA): {t_sgm*1e3:.3f} ms")


def sgm_wta(c):
    return sgm_wta_truncated(c, P1=0.1, P2=0.5, n_directions=8,
                             strategy=ExtractionStrategy.SCORE,
                             h_radius=3, v_radius=3, cost_vol_radius=1)


t_sw = device_time(sgm_wta, cv)
print(f"sgm_wta_truncated: {t_sw*1e3:.3f} ms")


def full(l, r):
    c = cv_build(l, r)
    idx, tcv = sgm_wta(c)
    return refine_disp_cost_interpolation(InterpolationKernel.PARABOLA,
                                          tcv, idx)


t_full = device_time(full, img_l, img_r)
print(f"full pipeline: {t_full*1e3:.3f} ms  ({1/t_full:.1f} fps)")

ca = cost_analysis(full, img_l, img_r)
print(f"flops={ca.get('flops',0):.3e} bytes={ca.get('bytes accessed',0):.3e}")
print(f"HBM-bound time @819GB/s: {float(ca.get('bytes accessed',0))/819e9*1e3:.3f} ms")

# volume sweep accounting: one (480,640,128) f32 volume
vol = 480 * 640 * 128 * 4
print(f"one padded volume = {vol/1e6:.1f} MB; sweep @819GB/s = {vol/819e9*1e3:.3f} ms")
