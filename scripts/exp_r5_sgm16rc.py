"""Round-5: rc sweep for the 16-direction f32 production pipeline
(7-carry down/up, 5-carry fwd passes) — interleaved in one window.
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

VARIANTS = {
    "base (picker)": {},
    "rc_down=4": {"rc_down": 4},
    "rc_down=2": {"rc_down": 2},
    "rc_up=4": {"rc_up": 4},
    "rc_fwd=4": {"rc_fwd": 4},
    "down4 up4 fwd4": {"rc_down": 4, "rc_up": 4, "rc_fwd": 4},
}


def full16(l, r):
    disp, _, _ = dense_sgm_stereo(
        MatchingFunction.ZNCC, l, r, 3, 3, D, P1=0.1, P2=0.5,
        n_directions=16, cost_vol_radius=1,
        refine_kernel=InterpolationKernel.PARABOLA, cv_dtype=jnp.float32)
    return disp


def forced(fn):
    def g(l, r):
        o = fn(l, r).astype(jnp.float32)
        return jnp.where(jnp.isfinite(o), o, 0.0).sum().reshape(1)
    return g


base = dhw.TUNE.copy()
timers, vals = {}, {}
for nm, tune in VARIANTS.items():
    dhw.TUNE.update(base | tune)
    vals[nm] = np.asarray(jax.jit(full16)(img_l, img_r))
    timers[nm] = device_timer(forced(full16), img_l, img_r)
    dhw.TUNE.update(base)
    print(f"[compiled] {nm}", flush=True)

ref = vals["base (picker)"]
for nm, v in vals.items():
    fin = np.isfinite(ref) & np.isfinite(v)
    d = np.abs(ref[fin] - v[fin])
    print(f"[check] {nm:16s} max|diff| {float(d.max()):.2e}", flush=True)

res = {nm: [] for nm in timers}
for rep in range(4):
    for nm, t_fn in timers.items():
        t = t_fn(iters=30) * 1e3
        res[nm].append(t)
        print(f"  rep{rep} {nm:16s} {t:7.3f} ms", flush=True)
print("\n=== medians ===")
for nm in timers:
    print(f"{nm:18s} {float(np.median(res[nm])):7.3f} ms")
