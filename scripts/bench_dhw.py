"""Round-2: time the DHW-layout flagship path vs the round-1 HWD path."""
import numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
from libstevi_tpu.core import MatchingFunction, ExtractionStrategy
from libstevi_tpu.ops import (unfold_based_cost_volume, sgm_wta_truncated,
                              refine_disp_cost_interpolation, InterpolationKernel)
from libstevi_tpu.utils.profiling import device_time

H, W, D = 480, 640, 120
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

def full_dhw(l, r):
    cv = unfold_based_cost_volume(MatchingFunction.ZNCC, l, r, 3, 3, D,
                                  backend="box", layout="dhw")
    idx, tcv = sgm_wta_truncated(cv, P1=0.1, P2=0.5, n_directions=8,
                                 strategy=ExtractionStrategy.SCORE,
                                 h_radius=3, v_radius=3, cost_vol_radius=1,
                                 layout="dhw")
    return refine_disp_cost_interpolation(InterpolationKernel.PARABOLA, tcv, idx)

def cv_dhw(l, r):
    return unfold_based_cost_volume(MatchingFunction.ZNCC, l, r, 3, 3, D,
                                    backend="box", layout="dhw")

def sgm_dhw(cv):
    return sgm_wta_truncated(cv, P1=0.1, P2=0.5, n_directions=8,
                             strategy=ExtractionStrategy.SCORE,
                             h_radius=3, v_radius=3, cost_vol_radius=1,
                             layout="dhw")

t = device_time(full_dhw, img_l, img_r)
print(f"full frame (dhw): {t*1e3:.3f} ms -> {1/t:.1f} fps")
t = device_time(cv_dhw, img_l, img_r)
print(f"  cv build (dhw): {t*1e3:.3f} ms")
cv = jax.jit(cv_dhw)(img_l, img_r)
t = device_time(sgm_dhw, cv)
print(f"  sgm_wta (dhw):  {t*1e3:.3f} ms")
