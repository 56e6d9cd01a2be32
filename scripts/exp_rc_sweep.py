"""Round-4: sweep the row-chunk size of each DHW SGM pass on-chip.

`_pick_rc` prefers the largest chunk that fits VMEM; PERF.md records
that oversizing can collapse double-buffering.  This measures each pass
isolated (device-chained, min-of-4) at the flagship geometry for
rc in {2, 4, 8}.
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from libstevi_tpu.ops import sgm_pallas_dhw as dhw
from libstevi_tpu.utils.profiling import device_time

H, W, D = 480, 640, 120
Dp, Wp, Hl = 128, 640, 512
rng = np.random.default_rng(0)
cv_p = jnp.asarray(rng.uniform(0, 1, (H, Dp, Wp)).astype(np.float32)
                   ).astype(jnp.bfloat16)
cv_T = jnp.asarray(rng.uniform(0, 1, (Wp, Dp, Hl)).astype(np.float32)
                   ).astype(jnp.bfloat16)
acc = jnp.asarray(rng.uniform(0, 1, (H, Dp, Wp)).astype(np.float32)
                  ).astype(jnp.bfloat16)
acc_T = jnp.asarray(rng.uniform(0, 1, (Wp, Dp, Hl)).astype(np.float32)
                    ).astype(jnp.bfloat16)
kw = dict(ml=0, W_pout=W, P1=0.1, P2=0.5, Pout=100.0, interpret=False,
          knight=False)


import time


def tmin(fn, x, *rest, n=4, iters=100):
    """Compile the device-chained loop ONCE, then min over n timings."""
    @jax.jit
    def chained(z, k):
        def body(_, zc):
            out = fn(zc, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return zc + 1e-12 * leaf.astype(zc.dtype).ravel()[0]
        return jax.lax.fori_loop(0, k, body, z)

    np.asarray(chained(x, 1).ravel()[0])
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(chained(x, 1).ravel()[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(chained(x, 1 + iters).ravel()[0])
        t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / iters)
    return best * 1e3


for rc in (2, 4, 8):
    def down(v):
        return dhw._rows_call(v, None, RC=rc, N1=H, X1=W, reverse=False,
                              diag=True, transposed=False, H_corner=H,
                              corner_stream=True, **kw)

    def up(v, a):
        return dhw._rows_call(v, a, RC=rc, N1=H, X1=W, reverse=True,
                              diag=True, transposed=False, H_corner=H,
                              corner_stream=True, **kw)

    def fwd(v, a):
        return dhw._rows_call(v, a, RC=rc, N1=W, X1=H, reverse=False,
                              diag=False, transposed=True, H_corner=H,
                              **kw)

    print(f"rc={rc}: down {tmin(down, cv_p):7.3f}  "
          f"up {tmin(up, cv_p, acc):7.3f}  "
          f"fwd {tmin(fwd, cv_T, acc_T):7.3f} ms", flush=True)
