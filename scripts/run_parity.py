"""PARITY_r02: full-size rendered-fixture accuracy run, f32 + bf16.

Plays the reference's SimStereo accuracy experiment
(`examples/stereo-match/main.cpp:234-303`) on the committed exact-GT pair.
"""
import os, json, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/libstevi_tpu_xla")
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from libstevi_tpu.core import MatchingFunction, MATCH_TRAITS
from libstevi_tpu.io import read_image
from libstevi_tpu.ops import (unfold_based_cost_volume, sgm_wta_truncated,
                              refine_disp_cost_interpolation, InterpolationKernel)
from libstevi_tpu.statistics import prop_good, inlier_mae
from libstevi_tpu.utils.profiling import device_time

D = 120
L = jnp.asarray(read_image("tests/data/parity/left.stevimg", np.float32))
R = jnp.asarray(read_image("tests/data/parity/right.stevimg", np.float32))
gt = read_image("tests/data/parity/gt.stevimg", np.float32)
st = MATCH_TRAITS[MatchingFunction.ZNCC].strategy

def pipeline(dtype):
    def fn(l, r):
        cv = unfold_based_cost_volume(MatchingFunction.ZNCC, l, r, 3, 3, D,
                                      backend="box", layout="dhw",
                                      cv_dtype=dtype)
        idx, tcv = sgm_wta_truncated(cv, 0.1, 0.5, n_directions=8,
                                     strategy=st, h_radius=3, v_radius=3,
                                     cost_vol_radius=1, layout="dhw")
        disp = refine_disp_cost_interpolation(InterpolationKernel.PARABOLA,
                                              tcv, idx)
        return idx, disp
    return fn

out = {"pair": "tests/data/parity (rendered, exact analytic GT)",
       "pipeline": "box ZNCC r=3 + SGM-8 (P1=0.1,P2=0.5) + tie-last WTA "
                   "+ parabola subpixel, D=120", "configs": {}}
disps = {}
for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
    fn = jax.jit(pipeline(dt))
    idx, disp = fn(L, R)
    disp = np.asarray(disp, np.float32)
    idxn = np.asarray(idx, np.float32)
    t = device_time(lambda l, r: pipeline(dt)(l, r)[1], L, R)
    disps[name] = disp
    out["configs"][name] = {
        "prop_good_2.0": round(prop_good(disp, gt, 2.0), 4),
        "bad_2.0": round(1 - prop_good(disp, gt, 2.0), 4),
        "inlier_mae": round(inlier_mae(disp, gt, 2.0), 4),
        "idx_prop_good_2.0": round(prop_good(idxn, gt, 2.0), 4),
        "device_ms": round(t * 1e3, 3),
        "fps": round(1 / t, 1),
    }
    print(name, out["configs"][name], flush=True)

both = np.isfinite(disps["f32"]) & np.isfinite(disps["bf16"])
epe = np.abs(disps["f32"] - disps["bf16"])[both]
out["bf16_vs_f32"] = {
    "epe_mean": round(float(epe.mean()), 5),
    "epe_p99": round(float(np.percentile(epe, 99)), 5),
    "frac_same_halfpx": round(float((epe <= 0.5).mean()), 5),
}
print("bf16 vs f32:", out["bf16_vs_f32"], flush=True)
with open("/root/repo/PARITY_r02.json", "w") as f:
    json.dump(out, f, indent=1)
print("written PARITY_r02.json", flush=True)
