"""Round-5: clean A/B of the down->up barrier (9 interleaved reps x 40)."""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.ops import sgm_pallas_dhw as dhw
from libstevi_tpu.ops.sgm import dense_sgm_stereo
from libstevi_tpu.ops.refinement import InterpolationKernel
from libstevi_tpu.utils.profiling import device_timer

H, W, D = 480, 640, 120
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))


def pipe(l, r):
    disp, _, _ = dense_sgm_stereo(
        MatchingFunction.ZNCC, l, r, 3, 3, D, P1=0.1, P2=0.5,
        n_directions=8, cost_vol_radius=1,
        refine_kernel=InterpolationKernel.PARABOLA,
        cv_dtype=jnp.bfloat16)
    return disp


tA = device_timer(pipe, img_l, img_r)
dhw.TUNE["downup_barrier"] = True
try:
    tB = device_timer(pipe, img_l, img_r)
finally:
    dhw.TUNE["downup_barrier"] = False

resA, resB = [], []
for rep in range(9):
    a = tA(iters=40) * 1e3
    b = tB(iters=40) * 1e3
    resA.append(a)
    resB.append(b)
    print(f"rep{rep}  A {a:7.3f}  B {b:7.3f}  {'B' if b < a else 'A'}",
          flush=True)
print(f"\nmedians: A {float(np.median(resA)):.3f}  "
      f"B {float(np.median(resB)):.3f}   "
      f"B wins {sum(b < a for a, b in zip(resA, resB))}/9")
