"""Fourier transforms.

Reference parity: `imageProcessing/fourierTransform.h:33` —
`FourierTransformCalculator`, an FFTW wrapper with forward/backward 2-D
transforms.  Here `jnp.fft` (XLA FFT) replaces FFTW.
"""

from __future__ import annotations

import jax.numpy as jnp


class FourierTransformCalculator:
    """API-parity wrapper over jnp.fft for 2-D images."""

    def forward(self, img: jnp.ndarray) -> jnp.ndarray:
        return jnp.fft.fft2(img.astype(jnp.complex64))

    def backward(self, freq: jnp.ndarray) -> jnp.ndarray:
        return jnp.fft.ifft2(freq)

    def forward_real(self, img: jnp.ndarray) -> jnp.ndarray:
        return jnp.fft.rfft2(img.astype(jnp.float32))

    def backward_real(self, freq: jnp.ndarray, shape=None) -> jnp.ndarray:
        return jnp.fft.irfft2(freq, s=shape)

    @staticmethod
    def amplitude(freq: jnp.ndarray) -> jnp.ndarray:
        return jnp.abs(freq)

    @staticmethod
    def phase(freq: jnp.ndarray) -> jnp.ndarray:
        return jnp.angle(freq)
