"""Round-5: does the default-precision MXU-V builder change ACCURACY on
the structured parity fixtures (the quality evidence that counts), or
only on tie-saturated noise images?  Runs SGM-8 bf16 with MXU_V_PRECISION
in {None, 'default', 'highest'} on both fixtures and prints prop-good /
inlier MAE vs GT, plus cross-mode disparity agreement.
"""
import os, sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.io import read_image
from libstevi_tpu.ops import (dense_sgm_stereo, InterpolationKernel)
from libstevi_tpu.ops import box_pallas as bp
from libstevi_tpu.statistics import prop_good, inlier_mae

D = 120

for tag, ln, rn, gn in [("warp", "left.stevimg", "right.stevimg",
                         "gt.stevimg"),
                        ("occ", "left_occ.stevimg", "right_occ.stevimg",
                         "gt_occ.stevimg")]:
    L = jnp.asarray(read_image(f"tests/data/parity/{ln}", np.float32))
    R = jnp.asarray(read_image(f"tests/data/parity/{rn}", np.float32))
    gt = read_image(f"tests/data/parity/{gn}", np.float32)
    disps = {}
    for prec in (None, "default", "highest"):
        def pipe(l, r, prec=prec):
            old = bp.MXU_V_PRECISION
            bp.MXU_V_PRECISION = prec
            try:
                disp, _, _ = dense_sgm_stereo(
                    MatchingFunction.ZNCC, l, r, 3, 3, D, P1=0.1, P2=0.5,
                    n_directions=8, cost_vol_radius=1,
                    refine_kernel=InterpolationKernel.PARABOLA,
                    cv_dtype=jnp.bfloat16)
            finally:
                bp.MXU_V_PRECISION = old
            return disp
        disp = np.asarray(jax.jit(pipe)(L, R), np.float32)
        disps[prec] = disp
        print(f"{tag} {str(prec):8s} prop_good2.0 "
              f"{prop_good(disp, gt, 2.0):.4f} inlier_mae "
              f"{inlier_mae(disp, gt, 2.0):.4f}", flush=True)
    for prec in ("default", "highest"):
        a, b = disps[prec], disps[None]
        fin = np.isfinite(a) & np.isfinite(b)
        d = np.abs(a[fin] - b[fin])
        print(f"{tag} {prec:8s} vs VPU: mean {d.mean():.4f} "
              f"p99 {np.quantile(d, 0.99):.4f} max {d.max():.2f} "
              f"same_halfpx {(d <= 0.5).mean():.5f}", flush=True)
