import os, sys, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/libstevi_tpu_xla")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from libstevi_tpu.ops.patchmatch_pallas import probe
from libstevi_tpu.utils.profiling import device_time

H, W, Dp, D = 480, 640, 128, 120
rng = np.random.default_rng(0)
cv = jnp.asarray(rng.uniform(0, 1, (H, W, Dp)).astype(np.float32))
disp = jnp.asarray(rng.integers(0, D, (H, W)).astype(np.int32))
cost = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

def reduce_kernel(cv_ref, out_ref, *, RC):
    for rr in range(RC):
        out_ref[rr] = jnp.min(cv_ref[rr], axis=-1)

def run_reduce(x, rc):
    Hp, Wp, Dpp = x.shape
    vol = pl.BlockSpec((rc, Wp, Dpp), lambda h: (h, 0, 0), memory_space=pltpu.VMEM)
    mp = pl.BlockSpec((rc, Wp), lambda h: (h, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(functools.partial(reduce_kernel, RC=rc),
                          grid=(Hp // rc,), in_specs=[vol], out_specs=mp,
                          out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32))(x)

for rc in (8, 16, 48):
    t = device_time(lambda x: run_reduce(x, rc), cv)
    print(f"lane-min reduce rc={rc}: {t*1e3:.3f} ms", flush=True)
for rc in (16, 48):
    t = device_time(lambda c, d, s: probe(c, d, d, s, 0, D, rc=rc), cv, disp, cost)
    print(f"probe K=1 rc={rc}: {t*1e3:.3f} ms", flush=True)
# XLA baseline for the same reduction
t = device_time(lambda x: jnp.min(x, axis=-1), cv)
print(f"XLA lane-min: {t*1e3:.3f} ms", flush=True)
