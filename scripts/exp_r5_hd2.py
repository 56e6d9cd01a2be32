"""Round-5: where do HD D=320's ~14 ms of fwd+rev+WTA live?  Isolated
pieces from precomputed volumes (720x1280 D=320 bf16, T orientation):

  - fwd-T acc pass at rc=2 (production pick) and lane-chunked variants
  - the WTA-pad copies (cv_cols / adj_T -> Hl_pad=nl*Lc)
  - the fused WTA call alone
  - the down/up passes at their production rc picks (cross-check)
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

H, W, D = 720, 1280, 320
dt = jnp.bfloat16
isz = 2
Dp, Wp, Hl = 320, 1280, 720

rng = np.random.default_rng(0)
cv_T = jnp.asarray(rng.uniform(0, 1, (Wp, Dp, Hl)).astype(np.float32)
                   ).astype(dt)
adj_T = jnp.asarray(rng.uniform(0, 1, (Wp, Dp, Hl)).astype(np.float32)
                    ).astype(dt)
cv_nat = jnp.asarray(rng.uniform(0, 1, (H, Dp, Wp)).astype(np.float32)
                     ).astype(dt)
adj_nat = jnp.asarray(rng.uniform(0, 1, (H, Dp, Wp)).astype(np.float32)
                      ).astype(dt)

vb = 12 * 2**20
rc_d = dhw._pick_rc(Dp, Wp, 3, vb, n_streams=2, itemsize=isz)
rc_u = dhw._pick_rc(Dp, Wp, 3, vb, n_streams=3, itemsize=isz)
rc_f = dhw._pick_rc(Dp, Hl, 1, vb, n_streams=3, itemsize=isz)
print("rc_down", rc_d, "rc_up", rc_u, "rc_fwd", rc_f, flush=True)

kw = dict(ml=0, W_pout=W, P1=0.1, P2=0.5, Pout=100.0, interpret=False,
          knight=False, pout_baked=True)


def force_sum(*outs):
    tot = None
    for o in outs:
        v = o.astype(jnp.float32).sum()
        tot = v if tot is None else tot + v
    return tot.reshape(1)


def fwd(v):
    return force_sum(dhw._rows_call(v, adj_T, RC=rc_f, N1=W, X1=H,
                                    reverse=False, diag=False,
                                    transposed=True, H_corner=H, **kw))


def down(v):
    return force_sum(dhw._rows_call(v, None, RC=rc_d, N1=H, X1=W,
                                    reverse=False, diag=True,
                                    transposed=False, H_corner=H,
                                    corner_stream=True, **kw))


def up(v):
    if rc_u is None:
        a = dhw._rows_call(v, None, RC=rc_d, N1=H, X1=W, reverse=True,
                           diag=True, transposed=False, H_corner=H,
                           corner_stream=True, **kw)
        return force_sum(a + adj_nat)
    return force_sum(dhw._rows_call(v, adj_nat, RC=rc_u, N1=H, X1=W,
                                    reverse=True, diag=True,
                                    transposed=False, H_corner=H,
                                    corner_stream=True, **kw))


def transpose_T(v):
    return force_sum(jnp.transpose(v, (2, 1, 0)))


def wta_pad(v):
    Lc = 384
    return force_sum(jnp.pad(v, ((0, 0), (0, 0), (0, 2 * Lc - Hl))))


def wta_only(v):
    res = dhw.sgm_fused_wta_from_native(
        cv_nat, v, H, W, D, 0, W, 0.1, 0.5, 100.0, 8, wta_radius=1,
        interpret=False, pout_baked=True, refine=(3, 3))
    # isolate: only force the disp output; the down/up/fwd inside
    # recompute — so compare against wta_full below and subtract
    return force_sum(res[2])


timers = {
    "down (rc pick)": (down, cv_nat),
    "up (rc pick)": (up, cv_nat),
    "fwdT acc rc_pick": (fwd, cv_T),
    "transpose nat->T": (transpose_T, adj_nat),
    "wta pad +2x384": (wta_pad, adj_T),
}
built = {}
for nm, (fn, arg) in timers.items():
    try:
        built[nm] = device_timer(fn, arg)
        print(f"[compiled] {nm}", flush=True)
    except Exception as e:
        print(f"[FAILED] {nm}: {str(e)[:200]}", flush=True)

res = {nm: [] for nm in built}
for rep in range(3):
    for nm, t_fn in built.items():
        t = t_fn(iters=10) * 1e3
        res[nm].append(t)
        print(f"  rep{rep} {nm:18s} {t:8.3f} ms", flush=True)
print("\n=== medians ===")
for nm in built:
    print(f"{nm:20s} {float(np.median(res[nm])):8.3f} ms")
