"""Round-5: SD rows under the raised scoped-VMEM pool (cross-process
vs committed default-pool records; the flag is process-global).

Run: LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
     python scripts/exp_r5_vmem_sd.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
print("LIBTPU_INIT_ARGS =", os.environ.get("LIBTPU_INIT_ARGS"), flush=True)

import numpy as np
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.ops.sgm import dense_sgm_stereo
from libstevi_tpu.ops.refinement import InterpolationKernel
from libstevi_tpu.utils.profiling import device_timer

H, W = 480, 640
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))


def make(D, dt):
    def pipe(l, r):
        disp, _, _ = dense_sgm_stereo(
            MatchingFunction.ZNCC, l, r, 3, 3, D, P1=0.1, P2=0.5,
            n_directions=8, cost_vol_radius=1,
            refine_kernel=InterpolationKernel.PARABOLA, cv_dtype=dt)
        return disp
    return pipe


rows = {
    "D120 bf16 (rec 3.34-3.48)": make(120, jnp.bfloat16),
    "D160 bf16 (rec 4.34)": make(160, jnp.bfloat16),
    "D300 bf16 (rec 10.41)": make(300, jnp.bfloat16),
    "D300 f32  (rec 14.38)": make(300, jnp.float32),
}
built = {}
for nm, fn in rows.items():
    print("compiling", nm, flush=True)
    built[nm] = device_timer(fn, img_l, img_r)

res = {nm: [] for nm in built}
for rep in range(5):
    for nm, t_fn in built.items():
        res[nm].append(t_fn(iters=30) * 1e3)
    print(f"rep{rep} " + "  ".join(f"{nm.split()[0]}:{res[nm][-1]:.3f}"
                                   for nm in built), flush=True)
print("\n=== medians ===")
for nm in built:
    print(f"{nm:28s} {float(np.median(res[nm])):8.3f} ms")
