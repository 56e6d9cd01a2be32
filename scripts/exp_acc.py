"""Isolate acc-mode and T-pass overheads: aliasing on/off, rc_t sweep."""
import functools, sys
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from libstevi_tpu.utils.profiling import device_time
import libstevi_tpu.ops.sgm_pallas_dhw as M

H1, W1, D = 480, 640, 120
rng = np.random.default_rng(0)
cv_p = jnp.asarray(rng.uniform(0, 1, (480, 120, 640)).astype(np.float32))
adj0 = jnp.asarray(rng.uniform(0, 1, (480, 120, 640)).astype(np.float32))

def rows_call_noalias(cv_p, acc, *, RC, N1, X1, reverse, diag, transposed,
                      H_corner, alias, **kw):
    Np, Dp, Xp = cv_p.shape
    n_chunks = Np // RC
    idx = (lambda h: (n_chunks - 1 - h, 0, 0)) if reverse else (lambda h: (h, 0, 0))
    spec = pl.BlockSpec((RC, Dp, Xp), idx, memory_space=pltpu.VMEM)
    kernel = functools.partial(
        M._dhw_rows_kernel, RC=RC, Dp=Dp, Xp=Xp, N1=N1, X1=X1, ml=0,
        W_pout=kw['W_pout'], P1=0.1, P2=0.5, Pout=100.0,
        reverse=reverse, diag=diag, accumulate=acc is not None,
        transposed=transposed, with_carries=False, H_corner=H_corner)
    in_specs = [spec] if acc is None else [spec, spec]
    args = (cv_p,) if acc is None else (cv_p, acc)
    return pl.pallas_call(
        kernel, grid=(n_chunks,), in_specs=in_specs, out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Np, Dp, Xp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Dp, Xp), jnp.float32)] * (3 if diag else 1),
        input_output_aliases={1: 0} if (acc is not None and alias) else {},
        interpret=False)(*args)

for alias in (True, False):
    def up(x, a):
        return rows_call_noalias(x, a, RC=4, N1=H1, X1=W1, reverse=True,
                                 diag=True, transposed=False, H_corner=H1,
                                 alias=alias, W_pout=W1)
    t = device_time(up, cv_p, adj0)
    print(f"up acc diag alias={alias}: {t*1e3:.3f} ms")

# T-side
Hp_lanes = 512
cv_T = jnp.asarray(rng.uniform(0, 1, (640, 120, Hp_lanes)).astype(np.float32))
adj_T = jnp.asarray(rng.uniform(0, 1, (640, 120, Hp_lanes)).astype(np.float32))
for rc in (8, 16, 32):
    for alias in (True, False):
        def fwd(x, a):
            return rows_call_noalias(x, a, RC=rc, N1=W1, X1=H1, reverse=False,
                                     diag=False, transposed=True, H_corner=H1,
                                     alias=alias, W_pout=W1)
        t = device_time(fwd, cv_T, adj_T)
        print(f"fwd-T acc rc={rc} alias={alias}: {t*1e3:.3f} ms")
    def fwd_noacc(x):
        return rows_call_noalias(x, None, RC=rc, N1=W1, X1=H1, reverse=False,
                                 diag=False, transposed=True, H_corner=H1,
                                 alias=False, W_pout=W1)
    t = device_time(fwd_noacc, cv_T)
    print(f"fwd-T noacc rc={rc}: {t*1e3:.3f} ms")
