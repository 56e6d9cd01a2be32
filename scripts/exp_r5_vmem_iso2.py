"""Round-5: pinpoint the HD divergence.  All under the 64 MB pool:

  E1  exact default-pool config: rc_down=1, split up rc_up=1, rc_fwd=2
      full-width (fwd chunking blocked via force_wta_nl=2)
      -> expect bit-equal to the committed 16 MB-pool output
  E2  E1 but rc_up=8              -> isolates up-pass RC
  E3  E1 but rc_fwd=8 full-width  -> isolates fwd-pass RC
  E4  E1 but rc_down=8            -> isolates down-pass RC

Run: LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
     python scripts/exp_r5_vmem_iso2.py
"""
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

H, W, D = 720, 1280, 320
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

orig_run = dhw._run_dhw


def run(knobs, wta_nl=2):
    def forced(*a, **k):
        k["force_wta_nl"] = wta_nl
        return orig_run(*a, **k)
    dhw._run_dhw = forced
    for k, v in knobs.items():
        dhw.TUNE[k] = v
    try:
        disp, idx, _ = dense_sgm_stereo(
            MatchingFunction.ZNCC, img_l, img_r, 3, 3, D, P1=0.1, P2=0.5,
            n_directions=8, cost_vol_radius=1,
            refine_kernel=InterpolationKernel.PARABOLA,
            cv_dtype=jnp.bfloat16)
        return np.asarray(idx)
    finally:
        dhw._run_dhw = orig_run
        for k in knobs:
            dhw.TUNE[k] = None if k != "force_split_up" else False


i16 = np.load("/tmp/hd_idx_16mb.npy")
base = {"rc_down": 1, "rc_up": 1, "force_split_up": True, "rc_fwd": 2}
variants = {
    "E1 default-mimic": dict(base),
    "E2 rc_up=8": {**base, "rc_up": 8},
    "E3 rc_fwd=8": {**base, "rc_fwd": 8},
    "E4 rc_down=8": {**base, "rc_down": 8},
}
outs = {}
for nm, kn in variants.items():
    print(nm, kn, flush=True)
    outs[nm] = run(kn)
    nd16 = int((outs[nm] != i16).sum())
    print(f"  vs 16MB-pool: {nd16} differ ({100.0 * nd16 / i16.size:.2f}%)",
          flush=True)
e1 = outs["E1 default-mimic"]
for nm in list(variants)[1:]:
    nd = int((outs[nm] != e1).sum())
    print(f"{nm} vs E1: {nd} differ ({100.0 * nd / e1.size:.2f}%)")
