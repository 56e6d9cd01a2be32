import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/libstevi_tpu_xla")
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.ops import unfold
from libstevi_tpu.ops.cost_volume import aggregate_cost, normalize_feature_volume
from libstevi_tpu.utils.profiling import device_time

H, W, D, r = 480, 640, 120, 3
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
fv_l = jax.jit(lambda x: unfold(r, r, x))(img_l)
fv_r = jax.jit(lambda x: unfold(r, r, x))(img_r)

for func in (MatchingFunction.ZNCC, MatchingFunction.SAD,
             MatchingFunction.SSD):
    nl = jax.jit(lambda x: normalize_feature_volume(func, x))(fv_l)
    nr = jax.jit(lambda x: normalize_feature_volume(func, x))(fv_r)
    for backend in ("fused", "scan"):
        fn = lambda a, b: aggregate_cost(func, a, b, D, backend=backend)
        t = device_time(fn, nl, nr)
        print(f"aggregate_cost {func.name} {backend}: {t*1e3:.3f} ms",
              flush=True)
