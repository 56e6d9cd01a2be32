"""Standard convolution filters.

Reference parity: `imageProcessing/standardConvolutionFilters.h` —
`separatedGaussianFilters` (:213: taps exp(-d^2 / 2 sigma^2), optionally
normalized), `finiteDifferencesKernels` (:278: [-1, 0, 1]) and
`extendLinearKernels` (:325: [1, 2, 1]).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .convolutions import convolve_2d, PaddingInfos, PaddingType


def gaussian_filter_taps(sigma: float, radius: int,
                         normalize: bool = True) -> np.ndarray:
    d = np.arange(-radius, radius + 1, dtype=np.float64)
    taps = np.exp(-(d * d) / (2.0 * sigma * sigma))
    if normalize:
        taps /= taps.sum()
    return taps.astype(np.float32)


def separated_gaussian_filter(sigma: float, radius: int,
                              normalize: bool = True,
                              mode: PaddingType = PaddingType.MIRROR):
    """Returns the two 1-D Filter passes (vertical then horizontal)."""
    from .convolutions import Filter
    taps = gaussian_filter_taps(sigma, radius, normalize)
    pad = PaddingInfos(radius, mode=mode)
    no = PaddingInfos(0)
    v = Filter(jnp.asarray(taps[:, None]), (pad, no))
    h = Filter(jnp.asarray(taps[None, :]), (no, pad))
    return v, h


def finite_differences_kernel() -> np.ndarray:
    return np.asarray([-1.0, 0.0, 1.0], np.float32)


def extend_linear_kernel() -> np.ndarray:
    return np.asarray([1.0, 2.0, 1.0], np.float32)


def gaussian_blur(img: jnp.ndarray, sigma: float, radius: int | None = None,
                  mode: PaddingType = PaddingType.MIRROR) -> jnp.ndarray:
    if radius is None:
        radius = max(1, int(3 * sigma))
    v, h = separated_gaussian_filter(sigma, radius, True, mode)
    return h.convolve(v.convolve(img))
