"""Round-5: isolate WHICH re-opened HD config differs, under one pool
(64 MB) so every variant compiles in one process:

  A  64-MB defaults (resident CV Hb=240, rc=8, unsplit up, WTA nl=1)
  B  banded CV Hb=48 forced (rest as A)      -> isolates CV build
  C  WTA nl=2 forced (rest as A)             -> isolates WTA lane chunks
  D  rc_down=1 + split up + rc_fwd=2 forced  -> isolates DP chunking

Run: LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
     python scripts/exp_r5_vmem_iso.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.ops import box_pallas, sgm_pallas_dhw as dhw
from libstevi_tpu.ops.sgm import dense_sgm_stereo
from libstevi_tpu.ops.refinement import InterpolationKernel

H, W, D = 720, 1280, 320
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))


def run():
    disp, idx, _ = dense_sgm_stereo(
        MatchingFunction.ZNCC, img_l, img_r, 3, 3, D, P1=0.1, P2=0.5,
        n_directions=8, cost_vol_radius=1,
        refine_kernel=InterpolationKernel.PARABOLA, cv_dtype=jnp.bfloat16)
    return np.asarray(disp), np.asarray(idx)


orig_scope = box_pallas.box_fused_in_scope

print("A: 64MB defaults", flush=True)
dA, iA = run()
i16 = np.load("/tmp/hd_idx_16mb.npy")
print("  A idx == 16MB-pool idx:", np.array_equal(iA, i16), flush=True)

print("B: banded CV forced", flush=True)
box_pallas.box_fused_in_scope = lambda *a, **k: None
try:
    dB, iB = run()
finally:
    box_pallas.box_fused_in_scope = orig_scope
print("  B==A idx:", np.array_equal(iB, iA),
      " B==16MB idx:", np.array_equal(iB, i16), flush=True)

print("C: WTA nl=2 forced", flush=True)
# force via the internal hook: route through sgm_fused_wta_from_native's
# force_wta_nl plumbing by wrapping _run_dhw
orig_run = dhw._run_dhw
def run_forced(*a, **k):
    k["force_wta_nl"] = 2
    return orig_run(*a, **k)
dhw._run_dhw = run_forced
try:
    dC, iC = run()
finally:
    dhw._run_dhw = orig_run
print("  C==A idx:", np.array_equal(iC, iA), flush=True)

print("D: rc_down=1 + split up + rc_fwd=2 forced", flush=True)
dhw.TUNE["rc_down"] = 1
dhw.TUNE["force_split_up"] = True
dhw.TUNE["rc_fwd"] = 2
try:
    dD, iD = run()
finally:
    dhw.TUNE["rc_down"] = None
    dhw.TUNE["force_split_up"] = False
    dhw.TUNE["rc_fwd"] = None
print("  D==A idx:", np.array_equal(iD, iA), flush=True)

for nm, ii in (("B", iB), ("C", iC), ("D", iD)):
    if not np.array_equal(ii, iA):
        nd = int((ii != iA).sum())
        print(f"  {nm}: {nd} idx pixels differ "
              f"({100.0 * nd / ii.size:.1f}%)", flush=True)
