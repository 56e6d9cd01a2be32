"""Round-5 exp A: isolated per-pass timings in one window — where is the
fat relative to the round-4 floors?  Interleaved, median-of-reps.

  - down pass at rc 8/4/2 (is the picker's choice oversized in context?)
  - up (acc) pass at picked rc and alternatives
  - fwd-T (acc) pass
  - plain transposes of freshly-written volumes
  - fwd as 2-stream + XLA add (transpose fused into add?)

Run: python -u scripts/exp_r5_passes.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from libstevi_tpu.ops import sgm_pallas_dhw as dhw
from libstevi_tpu.utils.profiling import device_timer

H, W, D = 480, 640, 120
dt = jnp.bfloat16
Dp, Wp, Hl = 128, 640, 480

rng = np.random.default_rng(0)
# synthetic volumes in the padded layouts (values irrelevant for timing)
cv_nat = jnp.asarray(rng.uniform(0, 1, (H, Dp, Wp)).astype(np.float32)
                     ).astype(dt)
cv_T = jnp.asarray(rng.uniform(0, 1, (Wp, Dp, Hl)).astype(np.float32)
                   ).astype(dt)
adj0 = jnp.asarray(rng.uniform(0, 1, (H, Dp, Wp)).astype(np.float32)
                   ).astype(dt)
adj0_T = jnp.transpose(adj0, (2, 1, 0))

kw = dict(ml=0, W_pout=W, P1=0.1, P2=0.5, Pout=100.0, interpret=False,
          knight=False, pout_baked=True)


def force_sum(*outs):
    tot = None
    for o in outs:
        v = o.astype(jnp.float32).sum()
        tot = v if tot is None else tot + v
    return tot.reshape(1)


VARIANTS = {}

for rc in (8, 4, 2):
    VARIANTS[f"down rc={rc}"] = (lambda v, rc=rc: force_sum(
        dhw._rows_call(v, None, RC=rc, N1=H, X1=W, reverse=False,
                       diag=True, transposed=False, H_corner=H,
                       corner_stream=True, **kw)), cv_nat)

for rc in (8, 4, 2):
    VARIANTS[f"up(acc) rc={rc}"] = (lambda v, rc=rc: force_sum(
        dhw._rows_call(v, adj0, RC=rc, N1=H, X1=W, reverse=True,
                       diag=True, transposed=False, H_corner=H,
                       corner_stream=True, **kw)), cv_nat)

for rc in (8, 4, 2):
    VARIANTS[f"fwdT(acc) rc={rc}"] = (lambda v, rc=rc: force_sum(
        dhw._rows_call(v, adj0_T, RC=rc, N1=W, X1=H, reverse=False,
                       diag=False, transposed=True, H_corner=H, **kw)),
        cv_T)

VARIANTS["fwdT 2stream rc=8"] = (lambda v: force_sum(
    dhw._rows_call(v, None, RC=8, N1=W, X1=H, reverse=False,
                   diag=False, transposed=True, H_corner=H, **kw)), cv_T)

VARIANTS["transpose nat->T"] = (lambda v: force_sum(
    jnp.transpose(v, (2, 1, 0))), adj0)

VARIANTS["fwdT 2stream + add(T(adj))"] = (lambda v: force_sum(
    jnp.transpose(v, (2, 1, 0))
    + dhw._rows_call(cv_T, None, RC=8, N1=W, X1=H, reverse=False,
                     diag=False, transposed=True, H_corner=H, **kw)), adj0)

names = sys.argv[1:] or list(VARIANTS)
timers = {}
for nm in names:
    fn, arg = VARIANTS[nm]
    timers[nm] = device_timer(fn, arg)     # compile ONCE per variant
    print(f"[compiled] {nm}", flush=True)

res = {nm: [] for nm in timers}
for rep in range(3):
    for nm, t_fn in timers.items():
        t = t_fn(iters=40) * 1e3
        res[nm].append(t)
        print(f"  rep{rep} {nm:28s} {t:7.3f} ms", flush=True)
print("\n=== medians ===")
for nm in timers:
    print(f"{nm:30s} {float(np.median(res[nm])):7.3f} ms")
