"""Per-pass timing of the DHW SGM kernels."""
import functools, sys
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from libstevi_tpu.utils.profiling import device_time
import libstevi_tpu.ops.sgm_pallas_dhw as M

H1, W1, D = 480, 640, 120
rng = np.random.default_rng(0)
region = jnp.asarray(rng.uniform(0, 1, (H1, D, W1)).astype(np.float32))
kw = dict(ml=0, W_pout=W1, P1=0.1, P2=0.5, Pout=100.0, interpret=False)

Dp, Wp, Hp_lanes = 120, 640, 512
rc_n = M._pick_rc(Dp, Wp, 3, 12*1024*1024)
print("rc_n =", rc_n)
Hp = M._round_up(H1, rc_n)
cv_p = jnp.pad(region, ((0, Hp - H1), (0, 0), (0, 0)))

def down(x):
    return M._rows_call(x, None, RC=rc_n, N1=H1, X1=W1, reverse=False,
                        diag=True, transposed=False, H_corner=H1, **kw)
t = device_time(down, cv_p); print(f"down pass (diag, no-acc): {t*1e3:.3f} ms")

adj = jax.jit(down)(cv_p)
def up(x, a):
    return M._rows_call(x, a, RC=rc_n, N1=H1, X1=W1, reverse=True,
                        diag=True, transposed=False, H_corner=H1, **kw)
t = device_time(up, cv_p, adj); print(f"up pass (diag, acc):     {t*1e3:.3f} ms")

def down_v(x):
    return M._rows_call(x, None, RC=rc_n, N1=H1, X1=W1, reverse=False,
                        diag=False, transposed=False, H_corner=H1, **kw)
t = device_time(down_v, cv_p); print(f"down pass (vert only):   {t*1e3:.3f} ms")

def to_T(x):
    xt = jnp.transpose(x[:H1], (2, 1, 0))
    return jnp.pad(xt, ((0, 0), (0, 0), (0, Hp_lanes - H1)))
t = device_time(to_T, cv_p); print(f"transpose to (W,D,H):    {t*1e3:.3f} ms")

cv_T = jax.jit(to_T)(cv_p); adj_T = jax.jit(to_T)(adj)
def fwd(x, a):
    return M._rows_call(x, a, RC=8, N1=W1, X1=H1, reverse=False,
                        diag=False, transposed=True, H_corner=H1, **kw)
t = device_time(fwd, cv_T, adj_T); print(f"fwd-T pass (acc):        {t*1e3:.3f} ms")

def full(x):
    return M.sgm_fused_wta_dhw(x, 0, W1, 0.1, 0.5, 100.0, 8, wta_radius=1)
t = device_time(full, region); print(f"full fused wta:          {t*1e3:.3f} ms")

def adj_only(x):
    return M.sgm_fused_adj_dhw(x, 0, W1, 0.1, 0.5, 100.0, 8)
t = device_time(adj_only, region); print(f"full fused adj (no wta): {t*1e3:.3f} ms")
