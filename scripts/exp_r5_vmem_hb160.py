"""Round-5: D=160 bf16 Hb A/B under the raised pool (the 64 MB pool
newly admits Hb=240 at Dp=160; check it against the default pick).

Run: LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
     python scripts/exp_r5_vmem_hb160.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.ops import box_pallas
from libstevi_tpu.ops.sgm import dense_sgm_stereo
from libstevi_tpu.ops.refinement import InterpolationKernel
from libstevi_tpu.utils.profiling import device_timer

H, W, D = 480, 640, 160
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

print("auto pick:", box_pallas.box_fused_in_scope(
    MatchingFunction.ZNCC, (H, W), 3, 3, 160, jnp.bfloat16), flush=True)

orig = box_pallas.box_fused_in_scope


def pipe(l, r):
    disp, _, _ = dense_sgm_stereo(
        MatchingFunction.ZNCC, l, r, 3, 3, D, P1=0.1, P2=0.5,
        n_directions=8, cost_vol_radius=1,
        refine_kernel=InterpolationKernel.PARABOLA,
        cv_dtype=jnp.bfloat16)
    return disp


built = {}
ref = None
for hb in (240, 120, 96, 48):
    box_pallas.box_fused_in_scope = lambda *a, hb=hb, **k: hb
    try:
        print("compiling Hb", hb, flush=True)
        built[hb] = device_timer(pipe, img_l, img_r)
        out = np.asarray(pipe(img_l, img_r))
        if ref is None:
            ref = out
        else:
            print("  exact vs Hb240:",
                  np.allclose(out, ref, equal_nan=True, atol=0), flush=True)
    finally:
        box_pallas.box_fused_in_scope = orig

res = {hb: [] for hb in built}
for rep in range(5):
    for hb, t_fn in built.items():
        res[hb].append(t_fn(iters=30) * 1e3)
    print(f"rep{rep} " + "  ".join(f"Hb{hb}:{res[hb][-1]:.3f}"
                                   for hb in built), flush=True)
print("\n=== medians ===")
for hb in built:
    print(f"Hb{hb:4d} {float(np.median(res[hb])):8.3f} ms")
