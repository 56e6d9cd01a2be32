"""Round-5: HD D=320 bf16 end-to-end under a raised scoped-VMEM pool.

Run: LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
     python scripts/exp_r5_vmem_hd.py

At the default 16 MB pool this geometry is forced to: banded CV Hb=48
(1.33x halo recompute), rc_down=1, split up-pass, fwd rc=2 or
lane-chunked, WTA lane-chunked — 35.5-35.9 ms committed.  The raised
pool should re-open resident CV Hb=240, rc 4-8 row chunks, an unsplit
up pass, and a single-chunk WTA.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
print("LIBTPU_INIT_ARGS =", os.environ.get("LIBTPU_INIT_ARGS"), flush=True)

import numpy as np
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.ops import box_pallas, sgm_pallas_dhw as dhw
from libstevi_tpu.ops.sgm import dense_sgm_stereo
from libstevi_tpu.ops.refinement import InterpolationKernel
from libstevi_tpu.utils.profiling import device_timer

H, W, D = 720, 1280, 320

print("scope limits: _SCOPED_LIMIT", dhw._SCOPED_LIMIT,
      "_VMEM_BUDGET", dhw._VMEM_BUDGET,
      "FUSED_HARD", box_pallas._FUSED_EST_HARD, flush=True)
hb_res = box_pallas.box_fused_in_scope(
    MatchingFunction.ZNCC, (H, W), 3, 3, 320, jnp.bfloat16)
hb_band = box_pallas.box_fused_banded_in_scope(
    MatchingFunction.ZNCC, (H, W), 3, 3, 320, jnp.bfloat16)
Dp, Wp = 320, 1280
Hl = 720
rc_d = dhw._pick_rc(Dp, Wp, 3, None, n_streams=2, itemsize=2)
rc_u = dhw._pick_rc(Dp, Wp, 3, None, n_streams=3, itemsize=2)
rc_f = dhw._pick_rc(Dp, Hl, 1, None, n_streams=3, itemsize=2)
print(f"resident Hb={hb_res} banded Hb={hb_band} "
      f"rc_down={rc_d} rc_up={rc_u} rc_fwd={rc_f}", flush=True)

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


print("compiling HD pipeline ...", flush=True)
t = device_timer(pipe, img_l, img_r)
print("compiled", flush=True)
res = []
for rep in range(5):
    res.append(t(iters=10) * 1e3)
    print(f"rep{rep} {res[-1]:8.3f} ms", flush=True)
print(f"\nmedian {float(np.median(res)):.3f} ms  "
      f"(committed default-pool record: 35.5-35.9 ms)")

# sanity: output finite fraction comparable to default path
out = np.asarray(pipe(img_l, img_r))
print("out shape", out.shape, "nan", int(np.isnan(out).sum()),
      "mean|disp|", float(np.nanmean(np.abs(out))))
