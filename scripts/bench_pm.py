import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/libstevi_tpu_xla")
import numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.core.search import SearchOffset1
from libstevi_tpu.ops.patchmatch import patch_match
from libstevi_tpu.utils.profiling import device_time

H, W, D = 480, 640, 120
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

def pm(l, r, key):
    return patch_match(MatchingFunction.NCC, l, r, SearchOffset1(0, D - 1),
                       h_radius=3, v_radius=3, n_iter=5, key=key)

key = jax.random.PRNGKey(0)
t = device_time(pm, img_l, img_r, key)
print(f"PatchMatch NCC r=3 D=120 5it: {t*1e3:.3f} ms -> {1/t:.1f} fps")
