"""Round-5: does --xla_tpu_scoped_vmem_limit_kib propagate through the
remote compile service, and does a raised limit unlock the configs the
16 MB scope forced down (CV Hb=480; bigger DP row chunks)?

Run:  XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 python scripts/exp_r5_vmemflag.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
print("XLA_FLAGS =", os.environ.get("XLA_FLAGS"), flush=True)

import numpy as np
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.ops import box_pallas
from libstevi_tpu.utils.profiling import device_timer

H, W, D = 480, 640, 120
Dp = 128
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))


def cv_hb(hb_val):
    def f(l, r):
        key = (480, hb_val, 640, 776, 2)
        box_pallas._FUSED_VERIFIED.add(key)
        try:
            return box_pallas._fused_call(
                "zncc", l, r, 3, 3, D, Dp, hb_val, jnp.bfloat16,
                False, negate=True, pad_d_inf=True, pout_bake=100.0)
        finally:
            box_pallas._FUSED_VERIFIED.discard(key)
    return f


built = {}
for hb_val in (240, 480):
    nm = f"cv Hb{hb_val}"
    try:
        print("compiling", nm, flush=True)
        built[nm] = device_timer(cv_hb(hb_val), img_l, img_r)
        print("  ok", flush=True)
    except Exception as e:
        print(f"  {nm} FAILED:", str(e)[:200], flush=True)

res = {nm: [] for nm in built}
for rep in range(5):
    for nm, t_fn in built.items():
        res[nm].append(t_fn(iters=30) * 1e3)
    print(f"rep{rep} " + "  ".join(f"{nm}:{res[nm][-1]:.3f}"
                                   for nm in built), flush=True)
for nm in built:
    print(f"{nm:10s} median {float(np.median(res[nm])):.3f} ms")
