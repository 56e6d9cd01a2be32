"""PatchMatch quality tests (statistical parity — the reference's RNG is
thread-based; quality targets follow `benchmarkStereoMatchingModels.cpp`)."""

import numpy as np
import jax
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.core.search import SearchOffset1
from libstevi_tpu.ops.patchmatch import patch_match


def test_patchmatch_recovers_constant_disparity(rng):
    base = rng.uniform(0.1, 1, (40, 56)).astype(np.float32)
    true_d = 5
    img_r = base
    img_l = np.roll(base, true_d, axis=1)
    disp = patch_match(MatchingFunction.ZNCC, jnp.asarray(img_l),
                       jnp.asarray(img_r), SearchOffset1(0, 15),
                       h_radius=2, v_radius=2, n_iter=5, n_random=4,
                       key=jax.random.PRNGKey(7))
    inner = np.asarray(disp)[6:-6, 6:-6 - true_d]
    assert (inner == true_d).mean() > 0.95


def test_patchmatch_piecewise_disparity(rng):
    base = rng.uniform(0.1, 1, (40, 60)).astype(np.float32)
    img_r = base
    # two regions with different shifts
    img_l = np.roll(base, 3, axis=1)
    img_l[20:] = np.roll(base[20:], 7, axis=1)
    disp = patch_match(MatchingFunction.ZNCC, jnp.asarray(img_l),
                       jnp.asarray(img_r), SearchOffset1(0, 12),
                       h_radius=2, v_radius=2, n_iter=6,
                       key=jax.random.PRNGKey(3))
    d = np.asarray(disp)
    top = d[5:14, 8:-12]
    bot = d[26:-5, 8:-12]
    assert (top == 3).mean() > 0.9
    assert (bot == 7).mean() > 0.9
