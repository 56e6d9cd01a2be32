"""Stage-by-stage timing mirroring _run_dhw exactly."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/libstevi_tpu_xla")
import functools, sys
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from libstevi_tpu.utils.profiling import device_time
import libstevi_tpu.ops.sgm_pallas_dhw as M

H1, W1, D = 480, 640, 120
rng = np.random.default_rng(0)
region = jnp.asarray(rng.uniform(0, 1, (H1, D, W1)).astype(np.float32))

Dp, Wp, Hp_lanes = 120, 640, 512
vb = 12 * 1024 * 1024
rc_down = M._pick_rc(Dp, Wp, 3, vb, n_streams=2)
rc_up = M._pick_rc(Dp, Wp, 3, vb, n_streams=3)
rc_fwd = M._pick_rc(Dp, Hp_lanes, 1, vb, n_streams=3)
print("rc_down", rc_down, "rc_up", rc_up, "rc_fwd", rc_fwd)
Hp = M._round_up(H1, 8)
cv_p = jnp.pad(region, ((0, Hp - H1), (0, 0), (0, 0)))
kw = dict(ml=0, W_pout=W1, P1=0.1, P2=0.5, Pout=100.0, interpret=False)

down = lambda x: M._rows_call(x, None, RC=rc_down, N1=H1, X1=W1, reverse=False,
                              diag=True, transposed=False, H_corner=H1, **kw)
print(f"down rc{rc_down}: {device_time(down, cv_p)*1e3:.3f} ms")
adj = jax.jit(down)(cv_p)
up = lambda x, a: M._rows_call(x, a, RC=rc_up, N1=H1, X1=W1, reverse=True,
                               diag=True, transposed=False, H_corner=H1, **kw)
print(f"up rc{rc_up}:   {device_time(up, cv_p, adj)*1e3:.3f} ms")
adj = jax.jit(up)(cv_p, adj)

def to_T(x):
    xt = jnp.transpose(x[:H1, :, :], (2, 1, 0))
    return jnp.pad(xt, ((0, 0), (0, 0), (0, Hp_lanes - H1)))
print(f"to_T: {device_time(to_T, cv_p)*1e3:.3f} ms")
cv_T, adj_T = jax.jit(to_T)(cv_p), jax.jit(to_T)(adj)

fwd = lambda x, a: M._rows_call(x, a, RC=rc_fwd, N1=W1, X1=H1, reverse=False,
                                diag=False, transposed=True, H_corner=H1, **kw)
print(f"fwd-T rc{rc_fwd}: {device_time(fwd, cv_T, adj_T)*1e3:.3f} ms")
adj_T = jax.jit(fwd)(cv_T, adj_T)

r, rc_t = 1, 8
n_chunks = Wp // rc_t
spec = pl.BlockSpec((rc_t, Dp, Hp_lanes), lambda h: (n_chunks - 1 - h, 0, 0),
                    memory_space=pltpu.VMEM)
map_spec = pl.BlockSpec((rc_t, Hp_lanes), lambda h: (n_chunks - 1 - h, 0),
                        memory_space=pltpu.VMEM)
kernel = functools.partial(M._dhw_wta_kernel, RC=rc_t, Dp=Dp, Xp=Hp_lanes,
                           N1=W1, X1=H1, D=D, ml=0, W_pout=W1, P1=0.1, P2=0.5,
                           Pout=100.0, r=r)
def wta(x, a):
    return pl.pallas_call(kernel, grid=(n_chunks,), in_specs=[spec, spec],
                          out_specs=[map_spec] * (2 + 2 * r),
                          out_shape=([jax.ShapeDtypeStruct((Wp, Hp_lanes), jnp.int32)]
                                     + [jax.ShapeDtypeStruct((Wp, Hp_lanes), jnp.float32)] * (2*r+1)),
                          scratch_shapes=[pltpu.VMEM((Dp, Hp_lanes), jnp.float32)],
                          interpret=False)(x, a)
print(f"wta-T rc{rc_t}: {device_time(wta, cv_T, adj_T)*1e3:.3f} ms")
full = lambda x: M.sgm_fused_wta_dhw(x, 0, W1, 0.1, 0.5, 100.0, 8, wta_radius=1)
print(f"full: {device_time(full, region)*1e3:.3f} ms")
