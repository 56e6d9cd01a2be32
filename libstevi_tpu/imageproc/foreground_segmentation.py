"""Global foreground/background segmentation via graph cut.

Reference parity: `imageProcessing/foregroundSegmentation.h` — `MaskInfo`
(Foreground=1/Background=0, :159), `SmoothingMaskCostPolicy` (:246: constant
switch cost between 4-neighbors), `GuidedMaskCostPolicy` (:277: switch cost
modulated by guide similarity down to a minimum), `buildGraph` (:485:
per-pixel terminal edges from the (H, W, 2) cost array + pairwise submodular
edges), `getGlobalRefinedMask` (:751: min cut -> mask), and
`hierarchicalGlobalRefinedMask` (:844: coarse-to-fine with only the
boundary band re-optimized at each level).

Design: the grid-cut runs on the host through `graphs.flow` (scipy
preflow-push) — graph cuts are pointer-chasing by nature; the cost maps
feeding the graph are computed on device.
"""

from __future__ import annotations

import enum

import numpy as np


class MaskInfo(enum.IntEnum):
    BACKGROUND = 0
    FOREGROUND = 1


def _grid_edges(H, W, weights_h, weights_v):
    """Pairwise 4-neighborhood edges with per-edge weights (both
    directions, as graph-cut smoothing terms are symmetric)."""
    idx = np.arange(H * W).reshape(H, W)
    eu, ev, ew = [], [], []
    # horizontal neighbors
    eu.append(idx[:, :-1].ravel()); ev.append(idx[:, 1:].ravel())
    ew.append(weights_h.ravel())
    eu.append(idx[:, 1:].ravel()); ev.append(idx[:, :-1].ravel())
    ew.append(weights_h.ravel())
    # vertical neighbors
    eu.append(idx[:-1, :].ravel()); ev.append(idx[1:, :].ravel())
    ew.append(weights_v.ravel())
    eu.append(idx[1:, :].ravel()); ev.append(idx[:-1, :].ravel())
    ew.append(weights_v.ravel())
    return (np.concatenate(eu), np.concatenate(ev), np.concatenate(ew))


def get_global_refined_mask(cost: np.ndarray, switch_cost: float,
                            guide: np.ndarray | None = None,
                            min_switch_cost: float = 0.0,
                            guide_sigma: float = 0.1) -> np.ndarray:
    """cost: (H, W, 2) with [..., 0] = cost of labeling Background and
    [..., 1] = cost of labeling Foreground; returns (H, W) MaskInfo.

    With a guide image, the pairwise cost follows `GuidedMaskCostPolicy`:
    min_switch + (switch - min_switch) * exp(-(dI)^2 / 2 sigma^2).
    """
    from ..graphs.flow import max_flow_min_cut

    cost = np.asarray(cost, np.float64)
    H, W, _ = cost.shape
    n = H * W
    source, target = n, n + 1

    # terminal edges: source->pixel with the cost of labeling BACKGROUND
    # (cut when the pixel goes background), pixel->sink with the FOREGROUND
    # labeling cost — so the min cut pays each pixel's chosen label cost.
    w_fg = np.maximum(cost[..., 1].ravel(), 0)
    w_bg = np.maximum(cost[..., 0].ravel(), 0)

    if guide is not None:
        g = np.asarray(guide, np.float64)
        if g.ndim == 3:
            g = g.mean(-1)
        dh = np.abs(g[:, 1:] - g[:, :-1])
        dv = np.abs(g[1:, :] - g[:-1, :])
        wh = min_switch_cost + (switch_cost - min_switch_cost) \
            * np.exp(-(dh ** 2) / (2 * guide_sigma ** 2))
        wv = min_switch_cost + (switch_cost - min_switch_cost) \
            * np.exp(-(dv ** 2) / (2 * guide_sigma ** 2))
    else:
        wh = np.full((H, W - 1), switch_cost)
        wv = np.full((H - 1, W), switch_cost)

    eu, ev, ew = _grid_edges(H, W, wh, wv)
    pix = np.arange(n)
    edges = np.concatenate([
        np.stack([np.full(n, source), pix], 1),
        np.stack([pix, np.full(n, target)], 1),
        np.stack([eu, ev], 1)])
    caps = np.concatenate([w_bg, w_fg, ew])

    res = max_flow_min_cut(n + 2, edges, caps, source, target)
    # a source-side pixel cuts its pixel->sink edge and pays w_fg, i.e. it
    # takes the Foreground label; a sink-side pixel cuts source->pixel and
    # pays w_bg (Background) — the min cut is the minimum-energy labeling
    mask = res.source_side[:n].reshape(H, W)
    return np.where(mask, MaskInfo.FOREGROUND, MaskInfo.BACKGROUND)


def hierarchical_global_refined_mask(costs, switch_cost: float,
                                     guides=None, band: int = 2
                                     ) -> np.ndarray:
    """Coarse-to-fine refinement (`hierarchicalGlobalRefinedMask`, :844):
    solve the coarsest level globally, then at each finer level re-optimize
    only a band around the upsampled boundary (other pixels keep their
    upsampled labels by pinning them with large terminal costs).

    `costs` is a list of (H_l, W_l, 2) arrays, coarsest FIRST.
    """
    from ..imageproc.morphology import dilation
    import jax.numpy as jnp

    mask = None
    for level, cost in enumerate(costs):
        guide = None if guides is None else guides[level]
        H, W, _ = np.asarray(cost).shape
        if mask is None:
            mask = get_global_refined_mask(cost, switch_cost, guide)
            continue
        # upsample previous mask to this level
        up = np.kron(mask, np.ones((2, 2), mask.dtype))[:H, :W]
        if up.shape != (H, W):
            up = np.pad(up, ((0, H - up.shape[0]), (0, W - up.shape[1])),
                        mode="edge")
        # boundary band
        m = up.astype(np.float32)
        grown = np.asarray(dilation(jnp.asarray(m), radius=band))
        shrunk = -np.asarray(dilation(jnp.asarray(-m), radius=band))
        boundary = (grown != shrunk)
        # pin non-boundary pixels
        BIG = 1e6
        c = np.asarray(cost, np.float64).copy()
        pin_fg = (~boundary) & (up == MaskInfo.FOREGROUND)
        pin_bg = (~boundary) & (up == MaskInfo.BACKGROUND)
        c[pin_fg, 0] = BIG   # forbid background
        c[pin_bg, 1] = BIG   # forbid foreground
        mask = get_global_refined_mask(c, switch_cost, guide)
    return mask
