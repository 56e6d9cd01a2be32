"""Probe real VMEM: acc pass at rc 8/16/32 with raised vmem_limit_bytes."""
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
cv_p = jnp.asarray(rng.uniform(0, 1, (480, 120, 640)).astype(np.float32))
adj0 = jnp.asarray(rng.uniform(0, 1, (480, 120, 640)).astype(np.float32))

def call(cv_p, acc, RC, vlim):
    Np, Dp, Xp = cv_p.shape
    n_chunks = Np // RC
    spec = pl.BlockSpec((RC, Dp, Xp), lambda h: (n_chunks - 1 - h, 0, 0),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(
        M._dhw_rows_kernel, RC=RC, Dp=Dp, Xp=Xp, N1=H1, X1=W1, ml=0,
        W_pout=W1, P1=0.1, P2=0.5, Pout=100.0,
        reverse=True, diag=True, accumulate=True,
        transposed=False, with_carries=False, H_corner=H1)
    return pl.pallas_call(
        kernel, grid=(n_chunks,), in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Np, Dp, Xp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Dp, Xp), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vlim),
        interpret=False)(cv_p, acc)

rc, vlim = int(sys.argv[1]), int(sys.argv[2]) * (1 << 20)
fn = lambda x, a: call(x, a, rc, vlim)
print(f"up acc rc={rc} vlim={sys.argv[2]}MB: {device_time(fn, cv_p, adj0)*1e3:.3f} ms")
