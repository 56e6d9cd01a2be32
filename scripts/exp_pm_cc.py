import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/libstevi_tpu_xla")
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from libstevi_tpu.ops.patchmatch_pallas import sweep, probe, _round_up
from libstevi_tpu.utils.profiling import device_time

H, W, D = 480, 640, 120
Dp = 128
rng = np.random.default_rng(0)
cv = jnp.asarray(rng.uniform(0, 1, (H, W, Dp)).astype(np.float32))
disp = jnp.asarray(rng.integers(0, D, (H, W)).astype(np.int32))
cost = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
for vc in (1, 2, 4, 8):
    fn = lambda c, d, s: sweep(c, d, s, 0, D, H, reverse=False, cc=8, vc=vc)
    t = device_time(fn, cv, disp, cost)
    print(f"sweep vc={vc}: {t*1e3:.3f} ms", flush=True)
fn = lambda c, d, s: probe(c, jnp.stack([d, d + 1, d + 2, d - 1], 1), d, s, 0, D)
t = device_time(fn, cv, disp, cost)
print(f"probe K=4: {t*1e3:.3f} ms", flush=True)
fn = lambda c, d, s: probe(c, d, d, s, 0, D)
t = device_time(fn, cv, disp, cost)
print(f"probe K=1: {t*1e3:.3f} ms", flush=True)
