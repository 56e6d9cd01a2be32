"""Round-5: HD D=320 bf16 output under the current scoped-VMEM pool ->
dump to /tmp for a cross-pool bit-compare (banded Hb=48 CV at the
default pool vs resident Hb=240 at 64 MB; rc/WTA chunking differs too).

Run once plain, once with LIBTPU_INIT_ARGS, then compare.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.ops.sgm import dense_sgm_stereo
from libstevi_tpu.ops.refinement import InterpolationKernel
from libstevi_tpu.utils.vmem import scoped_vmem_bytes

H, W, D = 720, 1280, 320
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

disp, idx, _ = dense_sgm_stereo(
    MatchingFunction.ZNCC, img_l, img_r, 3, 3, D, P1=0.1, P2=0.5,
    n_directions=8, cost_vol_radius=1,
    refine_kernel=InterpolationKernel.PARABOLA, cv_dtype=jnp.bfloat16)
tag = scoped_vmem_bytes() // 2**20
np.save(f"/tmp/hd_disp_{tag}mb.npy", np.asarray(disp))
np.save(f"/tmp/hd_idx_{tag}mb.npy", np.asarray(idx))
print("saved", tag, "MB pool", flush=True)
