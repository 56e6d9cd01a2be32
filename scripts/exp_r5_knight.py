"""Round-5: localize the 16-direction bf16 packed-pair break.

Ablations (timing-only, values wrong where noted), interleaved:
  A full 16-dir bf16 (production)
  B full 16-dir bf16, knight weight multiply ablated (extra = sum adj)
  C full 16-dir bf16, knight carries ablated entirely (= 8-dir work + 4
    dead carries... actually skip knight rows wholesale)
  D full 8-dir bf16 (reference point)
If B ~= D-scaled, the weight multiply is the packing break; if B ~= A,
the cost is the carries themselves.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.ops import dense_sgm_stereo, InterpolationKernel
from libstevi_tpu.ops import sgm_pallas_dhw as dhw
from libstevi_tpu.utils.profiling import device_timer

H, W, D = 480, 640, 120
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

_orig_knight_row = dhw._knight_row


def _knight_row_noweight(c_k, base, pa, t, t_par, lanes, X1, P1, P2, upd,
                         dt, zcol, w_stream=None):
    concrete_par = isinstance(t_par, int)
    extra = None
    new = []
    for kk, c in enumerate(c_k):
        plus = kk < 2
        phase_b = kk % 2 == 1
        c_pre = c
        want = 1 if phase_b else 0
        if concrete_par and t_par == want:
            c = (jnp.concatenate([zcol, c[:, :-1]], 1) if plus
                 else jnp.concatenate([c[:, 1:], zcol], 1))
        cur, adj = dhw._dw_step(c, base, pa, P1, P2)
        new.append(upd(c_pre, cur))
        extra = adj if extra is None else extra + adj   # NO weight mult
    return new, extra


def full(nd, dt):
    def fn(l, r):
        disp, _, _ = dense_sgm_stereo(
            MatchingFunction.ZNCC, l, r, 3, 3, D, P1=0.1, P2=0.5,
            n_directions=nd, cost_vol_radius=1,
            refine_kernel=InterpolationKernel.PARABOLA, cv_dtype=dt)
        return disp
    return fn


def full16_bf16_forced(l, r):
    # route 16-dir through bf16 by bypassing dense_sgm_stereo's f32
    # forcing: call the internals directly
    from libstevi_tpu.ops.box_pallas import box_cost_volume_fused_padded
    cv_nat = box_cost_volume_fused_padded(
        MatchingFunction.ZNCC, l, r, 3, 3, D, 128, jnp.bfloat16,
        negate=True, pout_bake=100.0, interpret=False)
    cv_T = jnp.transpose(cv_nat, (2, 1, 0))
    res = dhw.sgm_fused_wta_from_native(
        cv_nat, cv_T, H, W, D, 0, W, 0.1, 0.5, 100.0, 16, wta_radius=1,
        interpret=False, pout_baked=True, refine=(3, 3))
    return res[2]


def forced(fn):
    def g(l, r):
        o = fn(l, r).astype(jnp.float32)
        return jnp.where(jnp.isfinite(o), o, 0.0).sum().reshape(1)
    return g


timers = {}
timers["A 16dir bf16"] = device_timer(forced(full16_bf16_forced),
                                      img_l, img_r)
print("[compiled] A", flush=True)
dhw._knight_row = _knight_row_noweight
timers["B 16dir bf16 noweight"] = device_timer(forced(full16_bf16_forced),
                                               img_l, img_r)
dhw._knight_row = _orig_knight_row
print("[compiled] B", flush=True)
timers["C 16dir f32"] = device_timer(forced(full(16, jnp.float32)),
                                     img_l, img_r)
print("[compiled] C", flush=True)
timers["D 8dir bf16"] = device_timer(forced(full(8, jnp.bfloat16)),
                                     img_l, img_r)
print("[compiled] D", flush=True)

res = {nm: [] for nm in timers}
for rep in range(4):
    for nm, t_fn in timers.items():
        t = t_fn(iters=30) * 1e3
        res[nm].append(t)
        print(f"  rep{rep} {nm:22s} {t:7.3f} ms", flush=True)
print("\n=== medians ===")
for nm in timers:
    print(f"{nm:24s} {float(np.median(res[nm])):7.3f} ms")
