"""Round-5 tail levers, interleaved in one process:

  A  baseline production pipeline (flagship bf16, as bench.py)
  B  + down->up optimization_barrier (TUNE["downup_barrier"])
  C  + CV band Hb=480 (one band, zero halo recompute) — admitted via a
     temporary _FUSED_VERIFIED entry; Mosaic may reject (scoped VMEM)
  D  isolated CV kernel Hb=240 vs Hb=480 (cross-check)
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.ops import box_pallas
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


built = {}

print("compiling A (baseline)", flush=True)
built["A base"] = device_timer(pipe, img_l, img_r)
ref = np.asarray(pipe(img_l, img_r))

print("compiling B (downup barrier)", flush=True)
dhw.TUNE["downup_barrier"] = True
try:
    built["B du-barrier"] = device_timer(pipe, img_l, img_r)
    outB = np.asarray(pipe(img_l, img_r))
    print("  B nan", np.isnan(outB).sum(), "ref nan", np.isnan(ref).sum(),
          "equal_nan", np.allclose(outB, ref, equal_nan=True, atol=0),
          flush=True)
finally:
    dhw.TUNE["downup_barrier"] = False

print("compiling C (Hb=480)", flush=True)
key480 = (480, 480, 640, 776, 2)
box_pallas._FUSED_VERIFIED.add(key480)
# relax the calibrated bound for the try-compile (estimator overcounts)
old_calib = box_pallas._FUSED_EST_CALIB
box_pallas._FUSED_EST_CALIB = 64 * 2**20
try:
    hb = box_pallas.box_fused_in_scope(
        MatchingFunction.ZNCC, (H, W), 3, 3, 128, jnp.bfloat16)
    print("  in_scope picks Hb =", hb, flush=True)
    if hb == 480:
        built["C Hb480"] = device_timer(pipe, img_l, img_r)
        out = np.asarray(pipe(img_l, img_r))
        print("  C exact vs A:", np.array_equal(out, ref), flush=True)
except Exception as e:
    print("  C FAILED:", str(e)[:300], flush=True)
finally:
    box_pallas._FUSED_VERIFIED.discard(key480)
    box_pallas._FUSED_EST_CALIB = old_calib

# isolated CV kernel at both bands
Dp = 128


def cv_hb(hb_val):
    def f(l, r):
        box_pallas._FUSED_VERIFIED.add((480, hb_val, 640, 776, 2))
        try:
            out = box_pallas._fused_call(
                "zncc", l, r, 3, 3, D, Dp, hb_val, jnp.bfloat16,
                False, negate=True, pad_d_inf=True, pout_bake=100.0)
        finally:
            box_pallas._FUSED_VERIFIED.discard((480, hb_val, 640, 776, 2))
        return out
    return f


for hb_val in (240, 480):
    nm = f"D cv-iso Hb{hb_val}"
    try:
        print("compiling", nm, flush=True)
        built[nm] = device_timer(cv_hb(hb_val), img_l, img_r)
    except Exception as e:
        print(f"  {nm} FAILED:", str(e)[:300], flush=True)

res = {nm: [] for nm in built}
for rep in range(5):
    for nm, t_fn in built.items():
        t = t_fn(iters=30) * 1e3
        res[nm].append(t)
        print(f"  rep{rep} {nm:16s} {t:8.3f} ms", flush=True)
print("\n=== medians ===")
for nm in built:
    print(f"{nm:16s} {float(np.median(res[nm])):8.3f} ms  "
          f"{[round(x, 3) for x in res[nm]]}")
