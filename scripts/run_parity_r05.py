"""PARITY_r05: full-size accuracy run on BOTH committed rendered fixtures
(the occlusion-free warp and the layered-occlusion scene), f32 + bf16.

Plays the reference's SimStereo accuracy experiment
(`examples/stereo-match/main.cpp:234-303`) across the config matrix the
VERDICT asked for: ZNCC WTA, SGM-8, SGM-16, census+SGM, hierarchical,
PatchMatch — with occlusion-aware ground truth (GT is NaN at occluded
pixels and discontinuity bands, so prop_good scores visible surfaces).
"""
import os, json, sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/libstevi_tpu_xla")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction, MATCH_TRAITS
from libstevi_tpu.core.search import SearchOffset1
from libstevi_tpu.io import read_image
from libstevi_tpu.ops import (unfold_based_cost_volume, sgm_wta_truncated,
                              extract_selected_index, selected_index_to_disp,
                              refine_disp_cost_interpolation,
                              InterpolationKernel, dense_sgm_stereo)
from libstevi_tpu.ops.hierarchical import hierarchical_truncated_cost_volume
from libstevi_tpu.ops.patchmatch import patch_match
from libstevi_tpu.statistics import prop_good, inlier_mae

D = 120
ST = MATCH_TRAITS[MatchingFunction.ZNCC].strategy


def stats(disp, gt):
    return {"prop_good_2.0": round(prop_good(disp, gt, 2.0), 4),
            "bad_2.0": round(1 - prop_good(disp, gt, 2.0), 4),
            "inlier_mae": round(inlier_mae(disp, gt, 2.0), 4)}


def run_fixture(tag, lname, rname, gname):
    L = jnp.asarray(read_image(f"tests/data/parity/{lname}", np.float32))
    R = jnp.asarray(read_image(f"tests/data/parity/{rname}", np.float32))
    gt = read_image(f"tests/data/parity/{gname}", np.float32)
    out = {}

    for prec, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        def sgm_pipe(l, r, nd):
            disp, idx, _ = dense_sgm_stereo(
                MatchingFunction.ZNCC, l, r, 3, 3, D, P1=0.1, P2=0.5,
                n_directions=nd, cost_vol_radius=1,
                refine_kernel=InterpolationKernel.PARABOLA, cv_dtype=dt)
            return disp
        for nd in (8, 16):
            disp = np.asarray(jax.jit(
                lambda l, r, nd=nd: sgm_pipe(l, r, nd))(L, R), np.float32)
            out[f"zncc_sgm{nd}_{prec}"] = stats(disp, gt)
            print(tag, f"zncc_sgm{nd}_{prec}", out[f"zncc_sgm{nd}_{prec}"],
                  flush=True)
        cv = unfold_based_cost_volume(MatchingFunction.ZNCC, L, R, 3, 3, D,
                                      cv_dtype=dt, layout="dhw")
        idx = extract_selected_index(jnp.moveaxis(cv, 1, -1), ST)
        disp = np.asarray(selected_index_to_disp(idx), np.float32)
        out[f"zncc_wta_{prec}"] = stats(disp, gt)
        print(tag, f"zncc_wta_{prec}", out[f"zncc_wta_{prec}"], flush=True)

    # census + SGM (integer costs: precision split not meaningful)
    cv = unfold_based_cost_volume(MatchingFunction.CENSUS, L, R, 3, 3, D)
    stc = MATCH_TRAITS[MatchingFunction.CENSUS].strategy
    idx, tcv = sgm_wta_truncated(cv, 1.0, 4.0, n_directions=8, strategy=stc,
                                 h_radius=3, v_radius=3)
    disp = np.asarray(refine_disp_cost_interpolation(
        InterpolationKernel.PARABOLA, tcv, idx), np.float32)
    out["census_sgm8"] = stats(disp, gt)
    print(tag, "census_sgm8", out["census_sgm8"], flush=True)

    outh = hierarchical_truncated_cost_volume(
        MatchingFunction.ZNCC, L, R, 3, 3, disp_width=D, depth=2)
    out["hierarchical_d2"] = stats(
        np.asarray(outh.disp_estimate, np.float32), gt)
    print(tag, "hierarchical_d2", out["hierarchical_d2"], flush=True)

    disp = np.asarray(patch_match(
        MatchingFunction.NCC, L, R, SearchOffset1(0, D - 1), h_radius=3,
        v_radius=3, n_iter=5), np.float32)
    out["patchmatch_ncc_5it"] = stats(disp, gt)
    print(tag, "patchmatch_ncc_5it", out["patchmatch_ncc_5it"], flush=True)
    return out


result = {
    "pairs": {
        "warp": "tests/data/parity/{left,right,gt}.stevimg — "
                "occlusion-free smooth warp, exact analytic GT",
        "occluded": "tests/data/parity/{left,right,gt}_occ.stevimg — "
                    "layered scene with true occlusions (6.8% of pixels), "
                    "20-60 px disparity jumps, exposure gain/gamma + noise "
                    "asymmetry between views; GT NaN at occlusions",
    },
    "geometry": "480x640, D=120",
    "warp": run_fixture("warp", "left.stevimg", "right.stevimg",
                        "gt.stevimg"),
    "occluded": run_fixture("occ", "left_occ.stevimg", "right_occ.stevimg",
                            "gt_occ.stevimg"),
}
with open("/root/repo/PARITY_r05.json", "w") as f:
    json.dump(result, f, indent=1)
print("written PARITY_r05.json", flush=True)
