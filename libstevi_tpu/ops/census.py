"""Census transform: bit-pack per-patch comparisons into uint32 words.

Reference parity: `correlation/census.h:70-131`.  For an (H, W, F) feature
volume the census features are ceil((F-1)/32) uint32 words per pixel; bit b of
word w is ``features[0] > features[1 + 32*w + b]`` (the reference compares
every channel against channel 0, which for a Rotate0 unfold is the patch's
top-left sample).

Deviation (documented): the reference only stores a word once all 32 bits are
filled, so a trailing partial word is left *uninitialized*
(`census.h:103-108` — nothing flushes `d` after the loop).  We flush the
partial word (the clearly intended behavior); Hamming distances between two
census volumes produced by this module are unaffected for the full words and
become deterministic for the partial one.

TPU design: comparisons are a vectorized broadcast against channel 0; packing
is a weighted sum with static power-of-two weights per word — pure VPU, no
loops over pixels.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.margins import PaddingMargins
from .unfold import unfold

# census_data_t = uint32 (`correlation/matching_costs.h:773`)
census_dtype = jnp.uint32
CENSUS_WORD_BITS = 32


def census_features(base_features: jnp.ndarray) -> jnp.ndarray:
    """Pack an (..., F) feature volume into (..., ceil((F-1)/32)) census words."""
    F = base_features.shape[-1]
    if F <= 1:
        raise ValueError("census requires more than one feature channel")

    n_words = (F - 2) // CENSUS_WORD_BITS + 1
    ref = base_features[..., 0:1]
    bits = (ref > base_features[..., 1:]).astype(census_dtype)  # (..., F-1)

    pad = n_words * CENSUS_WORD_BITS - (F - 1)
    if pad:
        bits = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(0, pad)])
    bits = bits.reshape(bits.shape[:-1] + (n_words, CENSUS_WORD_BITS))
    weights = (jnp.uint32(1) << jnp.arange(CENSUS_WORD_BITS, dtype=census_dtype))
    return jnp.sum(bits * weights, axis=-1, dtype=census_dtype)


def census_transform_2d(image: jnp.ndarray, h_radius: int, v_radius: int,
                        padding: PaddingMargins = PaddingMargins()) -> jnp.ndarray:
    """Census transform of a 2-D (grayscale) or 3-D (multichannel) image.
    Reference: `censusTransform2D`, `correlation/census.h:118-131`."""
    fv = unfold(h_radius, v_radius, image, padding)
    return census_features(fv)
