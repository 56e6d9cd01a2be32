"""Histograms and automatic thresholds.

Reference parity: `imageProcessing/histogram.h:31` (`Histogram<T>`),
`foregroundSegmentation.h:51` (`computeOtsuThreshold`) and the
balanced-histogram threshold.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass
class Histogram:
    counts: jnp.ndarray
    edges: jnp.ndarray

    @classmethod
    def compute(cls, data: jnp.ndarray, n_bins: int = 256,
                vmin: float | None = None, vmax: float | None = None):
        x = data.astype(jnp.float32).ravel()
        lo = jnp.min(x) if vmin is None else vmin
        hi = jnp.max(x) if vmax is None else vmax
        edges = jnp.linspace(lo, hi, n_bins + 1)
        idx = jnp.clip(((x - lo) / jnp.maximum(hi - lo, 1e-12)
                        * n_bins).astype(jnp.int32), 0, n_bins - 1)
        counts = jnp.zeros(n_bins, jnp.int32).at[idx].add(1)
        return cls(counts, edges)

    @property
    def centers(self) -> jnp.ndarray:
        return (self.edges[:-1] + self.edges[1:]) / 2.0

    def entropy(self) -> jnp.ndarray:
        """Shannon entropy of the bin distribution in nats.  The
        reference's `Histogram::entropy` (`histogram.h:321-330`) returns
        the sum of SQUARED bin counts — a collision count, not an
        entropy; we compute the documented intent."""
        c = self.counts.astype(jnp.float32)
        p = c / jnp.maximum(jnp.sum(c), 1.0)
        return -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0))


def otsu_threshold(data: jnp.ndarray, n_bins: int = 256) -> jnp.ndarray:
    """Threshold maximizing between-class variance (`computeOtsuThreshold`,
    `foregroundSegmentation.h:51`)."""
    h = Histogram.compute(data, n_bins)
    counts = h.counts.astype(jnp.float32)
    centers = h.centers
    total = jnp.sum(counts)
    w0 = jnp.cumsum(counts)
    w1 = total - w0
    m0 = jnp.cumsum(counts * centers) / jnp.maximum(w0, 1e-12)
    m_total = jnp.sum(counts * centers) / total
    m1 = (m_total * total - jnp.cumsum(counts * centers)) \
        / jnp.maximum(w1, 1e-12)
    between = w0 * w1 * (m0 - m1) ** 2
    between = jnp.where((w0 > 0) & (w1 > 0), between, -jnp.inf)
    return centers[jnp.argmax(between)]


def balanced_histogram_threshold(data: jnp.ndarray, n_bins: int = 256
                                 ) -> jnp.ndarray:
    """Balanced histogram thresholding: the bin where the cumulative mass
    reaches half the total."""
    h = Histogram.compute(data, n_bins)
    counts = h.counts.astype(jnp.float32)
    cum = jnp.cumsum(counts)
    idx = jnp.argmax(cum >= cum[-1] / 2.0)
    return h.centers[idx]
