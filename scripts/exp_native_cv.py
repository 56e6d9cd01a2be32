"""Round-4: validate the native-layout CV builders + zero-relayout SGM
pipeline on CPU (interpret mode), bit-exact vs the existing path."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.ops.box_pallas import (box_cost_volume_fused,
                                         box_cost_volume_fused_padded)
from scripts.exp_cvT_builder import box_cost_volume_fused_T
from libstevi_tpu.ops import sgm_pallas_dhw as dhw

H, W, D = 43, 72, 17      # H deliberately NOT a multiple of 8
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

Hp = -(-H // 8) * 8
Wp = -(-W // 128) * 128
Hl = -(-H // 128) * 128
for dt, sub in ((jnp.float32, 8), (jnp.bfloat16, 16)):
    Dp = -(-D // sub) * sub
    for func in (MatchingFunction.ZNCC, MatchingFunction.NCC,
                 MatchingFunction.ZCC, MatchingFunction.CC):
        for neg in (False, True):
            base = box_cost_volume_fused(func, img_l, img_r, 3, 2, D,
                                         cv_dtype=dt, interpret=True)
            # reference construction: exactly `_run_dhw`'s pad chain
            s = -1.0 if neg else 1.0
            ref = (s * base.astype(jnp.float32)).astype(dt)  # (H, D, W)
            ref = jnp.pad(ref, ((0, 0), (0, Dp - D), (0, 0)),
                          constant_values=jnp.inf)
            ref = jnp.pad(ref, ((0, Hp - H), (0, 0), (0, Wp - W)))
            got = box_cost_volume_fused_padded(func, img_l, img_r, 3, 2,
                                               D, Dp, dt, negate=neg,
                                               interpret=True)
            np.testing.assert_array_equal(np.asarray(got, np.float32),
                                          np.asarray(ref, np.float32))
            # transposed layout vs `_run_dhw.to_T` of the padded volume
            ref_T = jnp.transpose(ref, (2, 1, 0))        # (Wp, Dp, Hp)
            ref_T = jnp.pad(ref_T, ((0, 0), (0, 0), (0, Hl - Hp)))
            got_T = box_cost_volume_fused_T(func, img_l, img_r, 3, 2, D,
                                            Dp, dt, negate=neg,
                                            interpret=True)
            np.testing.assert_array_equal(np.asarray(got_T, np.float32),
                                          np.asarray(ref_T, np.float32))
        print(f"builders ok {dt.__name__} {func}")

# full fused pipeline vs existing sgm_fused_wta_dhw on the same volume
for nd in (4, 8, 16):
    for dt in (jnp.float32, jnp.bfloat16):
        if nd >= 16 and dt == jnp.bfloat16:
            continue
        sub = 8 if dt == jnp.float32 else 16
        Dp = -(-D // sub) * sub
        base = box_cost_volume_fused(MatchingFunction.ZNCC, img_l, img_r,
                                     3, 3, D, cv_dtype=dt, interpret=True)
        neg = (-base.astype(jnp.float32)).astype(dt)     # SCORE -> COST
        old = dhw.sgm_fused_wta_dhw(neg, 0, W, 0.1, 0.5, 100.0, nd,
                                    wta_radius=1, interpret=True)
        cv_nat = box_cost_volume_fused_padded(
            MatchingFunction.ZNCC, img_l, img_r, 3, 3, D, Dp, dt,
            negate=True, interpret=True)
        cv_T = jnp.transpose(cv_nat, (2, 1, 0))
        new = dhw.sgm_fused_wta_from_native(
            cv_nat, cv_T, H, W, D, 0, W, 0.1, 0.5, 100.0, nd,
            wta_radius=1, interpret=True)
        assert old is not None and new is not None
        np.testing.assert_array_equal(np.asarray(old[0]),
                                      np.asarray(new[0]))
        np.testing.assert_array_equal(np.asarray(old[1], np.float32),
                                      np.asarray(new[1], np.float32))
        print(f"pipeline ok nd={nd} {dt.__name__}")
print("ALL OK")
