"""Round-5: in-context rc_up / rc_fwd sweep on the flagship pipeline
(the round-5 calibration only measured rc_down; iso-best rc_up=8 and
rc_fwd=8 were assumed in context)."""
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


variants = {
    "base (u8 f8)": {},
    "u4": {"rc_up": 4},
    "u2": {"rc_up": 2},
    "f4": {"rc_fwd": 4},
    "u4 f4": {"rc_up": 4, "rc_fwd": 4},
}
built = {}
ref = None
for nm, knobs in variants.items():
    for k, v in knobs.items():
        dhw.TUNE[k] = v
    try:
        print("compiling", nm, flush=True)
        built[nm] = device_timer(pipe, img_l, img_r)
        out = np.asarray(pipe(img_l, img_r))
        if ref is None:
            ref = out
        else:
            print("  exact:", np.allclose(out, ref, equal_nan=True, atol=0),
                  flush=True)
    finally:
        for k in knobs:
            dhw.TUNE[k] = None

res = {nm: [] for nm in built}
for rep in range(7):
    for nm, t_fn in built.items():
        t = t_fn(iters=40) * 1e3
        res[nm].append(t)
    print(f"rep{rep} " + "  ".join(f"{nm}:{res[nm][-1]:.3f}"
                                   for nm in built), flush=True)
print("\n=== medians ===")
for nm in built:
    print(f"{nm:14s} {float(np.median(res[nm])):8.3f} ms")
