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


def test_patchmatch_flow_recovers_translation(rng):
    from libstevi_tpu.core.search import SearchOffset2
    from libstevi_tpu.ops.patchmatch import patch_match_flow
    from libstevi_tpu.ops import unfold
    from libstevi_tpu.ops.cost_volume import normalize_feature_volume
    base = rng.uniform(0.1, 1, (36, 40)).astype(np.float32)
    di, dj = 2, -3
    tgt_img = base
    src_img = np.roll(np.roll(base, -di, axis=0), -dj, axis=1)
    # source pixel (i, j) matches target at (i + di, j + dj)
    func = MatchingFunction.ZNCC
    s = normalize_feature_volume(func, unfold(2, 2, jnp.asarray(src_img)))
    t = normalize_feature_volume(func, unfold(2, 2, jnp.asarray(tgt_img)))
    flow = patch_match_flow(func, s, t, SearchOffset2(-4, 4, -4, 4),
                            n_iter=6, key=jax.random.PRNGKey(2))
    f = np.asarray(flow)[6:-6, 6:-6]
    good = (f[..., 0] == di) & (f[..., 1] == dj)
    assert good.mean() > 0.9
