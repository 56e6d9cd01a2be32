"""Round-5 scheduling round 3: the adj_T barrier (pin the adjustment
relayout before the fwd pass), A/B interleaved on the production path.
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
from libstevi_tpu.ops import sgm_pallas_dhw as dhw
from libstevi_tpu.utils.profiling import device_timer

H, W, D = 480, 640, 120
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))


def full(l, r):
    disp, _, _ = dense_sgm_stereo(
        MatchingFunction.ZNCC, l, r, 3, 3, D, P1=0.1, P2=0.5,
        n_directions=8, cost_vol_radius=1,
        refine_kernel=InterpolationKernel.PARABOLA, cv_dtype=jnp.bfloat16)
    return disp


def forced(fn):
    def g(l, r):
        o = fn(l, r).astype(jnp.float32)
        return jnp.where(jnp.isfinite(o), o, 0.0).sum().reshape(1)
    return g


timers = {}
for flag in (False, True):
    dhw.TUNE["adj_T_barrier"] = flag
    timers[f"adj_T_barrier={flag}"] = device_timer(forced(full),
                                                   img_l, img_r)
    dhw.TUNE["adj_T_barrier"] = False
    print(f"[compiled] {flag}", flush=True)

res = {nm: [] for nm in timers}
for rep in range(5):
    for nm, t_fn in timers.items():
        t = t_fn(iters=40) * 1e3
        res[nm].append(t)
        print(f"  rep{rep} {nm:22s} {t:7.3f} ms", flush=True)
print("\n=== medians ===")
for nm in timers:
    print(f"{nm:24s} {float(np.median(res[nm])):7.3f} ms")
