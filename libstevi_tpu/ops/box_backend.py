"""Box-filter cost-volume backend: the TPU fast path.

Computes the same cost volumes as unfold -> normalize -> `aggregateCost`
(`correlation/cross_correlations.h:195,740`) for the window-decomposable
matching functions, WITHOUT materializing the (H, W, (2r+1)^2*C) feature
volume.  Identities used (n is the full feature count (2r+1)^2 * C as in
`channelsMean`, and all sums follow the unfold's zero-fill convention for
out-of-image samples):

    cross_d  = box(sum_c S * T_d)            (T_d = target shifted by d)
    CC   = cross_d
    NCC  = cross_d / (|S| * |T_d|),          |S| = sqrt(box(sum_c S^2))
    ZCC  = cross_d - box(S) * box(T_d) / n
    ZNCC = ZCC / (sigma_S * sigma_T_d),      sigma = sqrt(box(x^2) - box(x)^2/n)
    SSD  = vbox(sum_c (S - T_d)^2)
    ZSSD = SSD - (box(S) - box(T_d))^2 / n
    SAD  = vbox(sum_c |S - T_d|)

For the dot family, box() is a zero-'SAME'-padded window sum on the image
grid: a window sample outside either image contributes f(0, .) = 0, exactly
the unfold zero fill.  For SSD/SAD f(0, t) = t^2 / |t| is NOT zero, so vbox()
evaluates the product map on a radius-extended grid (both images zero-padded
by the window radii) and takes a VALID window sum — reproducing the
reference's asymmetric border behavior exactly.

Out-of-range target pixels (j + sign*d outside the image) get the reference's
"all-zero target feature vector" value (`cross_correlations.h:235`): 0 for
the dot family, sum(s_hat^2) for SSD-type, sum(|s_hat|) for SAD.

Complexity: O(H*W*D) versus the reference's O(H*W*D*F) — the window size
drops out entirely.  Accumulation order differs from the reference's
sequential dot products, so parity is within float tolerance, not bitwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import MatchingFunction, DispDirection
from ..core.search import SearchOffset1, SearchOffset2
from .filters import box_filter_2d

_BOX_FUNCS = {
    MatchingFunction.CC, MatchingFunction.NCC, MatchingFunction.ZCC,
    MatchingFunction.ZNCC, MatchingFunction.SSD, MatchingFunction.ZSSD,
    MatchingFunction.SAD,
}


def supports_box(func: MatchingFunction) -> bool:
    return func in _BOX_FUNCS


def _sum_c(x: jnp.ndarray) -> jnp.ndarray:
    return x if x.ndim == 2 else jnp.sum(x, axis=-1)


def _valid_box(x: jnp.ndarray, h_radius: int, v_radius: int) -> jnp.ndarray:
    """Window sum with VALID extraction (input already radius-extended)."""
    v = 2 * v_radius + 1
    h = 2 * h_radius + 1
    return jax.lax.reduce_window(x, jnp.zeros((), x.dtype), jax.lax.add,
                                 (v, h), (1, 1), "VALID")


def box_cost_volume(func: MatchingFunction, img_l: jnp.ndarray,
                    img_r: jnp.ndarray, h_radius: int, v_radius: int,
                    search, direction: DispDirection = DispDirection.RIGHT_TO_LEFT,
                    cv_dtype=jnp.float32, layout: str = "hwd") -> jnp.ndarray:
    if isinstance(search, SearchOffset2):
        raise NotImplementedError("box backend covers 1-D disparity search")
    if not supports_box(func):
        raise ValueError(f"{func} is not window-decomposable")
    if isinstance(search, SearchOffset1):
        disps = jnp.arange(search.count, dtype=jnp.int32) + search.lower
        lo, hi = search.lower, search.upper
    else:
        disps = jnp.arange(int(search), dtype=jnp.int32)
        lo, hi = 0, int(search) - 1

    if direction is DispDirection.RIGHT_TO_LEFT:
        src, tgt = img_r, img_l
    else:
        src, tgt = img_l, img_r
    sign = direction.delta_sign
    shifts = sign * disps
    min_shift = min(sign * lo, sign * hi)
    max_shift = max(sign * lo, sign * hi)

    src = src.astype(jnp.float32)
    tgt = tgt.astype(jnp.float32)
    if src.ndim == 2:
        src = src[..., None]
        tgt = tgt[..., None]
    H, W, C = src.shape
    n = (2 * h_radius + 1) * (2 * v_radius + 1) * C

    def box(x):
        return box_filter_2d(x, h_radius, v_radius)

    pad_l = max(0, -min_shift)
    pad_r = max(0, max_shift)
    jj = jnp.arange(W, dtype=jnp.int32)[None, :]

    def padw(x, extra_l=0, extra_r=0):
        return jnp.pad(x, ((0, 0), (pad_l + extra_l, pad_r + extra_r))
                       + ((0, 0),) * (x.ndim - 2))

    dot_family = func in (MatchingFunction.CC, MatchingFunction.NCC,
                          MatchingFunction.ZCC, MatchingFunction.ZNCC)

    # Source statistics (computed once).
    sum_s = box(_sum_c(src))
    sum_s2 = box(_sum_c(src * src))
    norm_s = jnp.sqrt(sum_s2)
    # clamp at 0: box(x^2) - box(x)^2/n cancels to ~-1e-6 in f32 on flat
    # patches, and sqrt(negative) = NaN poisons the WTA argmin there —
    # the reference's sum((s - mean)^2) is non-negative by construction
    sigma_s = jnp.sqrt(jnp.maximum(sum_s2 - sum_s * sum_s / n, 0.0))
    sad_boundary = box(_sum_c(jnp.abs(src)))    # loop-invariant: hoisted

    # Target statistics / images, pre-padded so each d is a static-size slice.
    sum_t_p = padw(box(_sum_c(tgt)))
    sum_t2_p = padw(box(_sum_c(tgt * tgt)))
    if dot_family:
        tgt_p = padw(tgt)
    else:
        # Radius-extended grids for the exact SSD/SAD border behavior.
        src_x = jnp.pad(src, ((v_radius, v_radius),
                              (h_radius, h_radius), (0, 0)))
        tgt_xp = padw(jnp.pad(tgt, ((v_radius, v_radius), (0, 0), (0, 0))),
                      h_radius, h_radius)
        Wx = W + 2 * h_radius

    def slice_w(x, shift, width):
        return jax.lax.dynamic_slice_in_dim(x, pad_l + shift, width, axis=1)

    def step(_, shift):
        in_range = jnp.broadcast_to((jj + shift >= 0) & (jj + shift < W), (H, W))

        if dot_family:
            t_d = slice_w(tgt_p, shift, W)
            cross = box(_sum_c(src * t_d))
            if func is MatchingFunction.CC:
                cost = cross
            elif func is MatchingFunction.NCC:
                norm_t = jnp.sqrt(slice_w(sum_t2_p, shift, W))
                den = norm_s * norm_t
                cost = jnp.where(den > 0, cross / jnp.where(den > 0, den,
                                                            1.0), 0.0)
            else:
                sum_t = slice_w(sum_t_p, shift, W)
                zcc = cross - sum_s * sum_t / n
                if func is MatchingFunction.ZCC:
                    cost = zcc
                else:
                    sum_t2 = slice_w(sum_t2_p, shift, W)
                    sigma_t = jnp.sqrt(
                        jnp.maximum(sum_t2 - sum_t * sum_t / n, 0.0))
                    # zero-variance windows score 0 (uncorrelated) —
                    # finite, unlike an unguarded 0/0 (the reference's
                    # direct sums hit the same undefined case as NaN)
                    den = sigma_s * sigma_t
                    cost = jnp.where(den > 0,
                                     zcc / jnp.where(den > 0, den, 1.0),
                                     0.0)
            boundary = jnp.zeros((H, W), jnp.float32)
        else:
            t_dx = slice_w(tgt_xp, shift, Wx)
            d = src_x - t_dx
            if func is MatchingFunction.SAD:
                cost = _valid_box(_sum_c(jnp.abs(d)), h_radius, v_radius)
                boundary = sad_boundary
            else:
                ssd = _valid_box(_sum_c(d * d), h_radius, v_radius)
                if func is MatchingFunction.SSD:
                    cost = ssd
                    boundary = sum_s2  # SSD against the zero vector
                else:  # ZSSD
                    sum_t = slice_w(sum_t_p, shift, W)
                    dm = sum_s - sum_t
                    cost = ssd - dm * dm / n
                    boundary = sum_s2 - sum_s * sum_s / n

        return None, jnp.where(in_range, cost, boundary).astype(cv_dtype)

    _, cv = jax.lax.scan(step, None, shifts)
    if layout == "dhw":
        # (D, H, W) -> (H, D, W): disparity on sublanes (the SGM Pallas
        # fast-path layout, `sgm_pallas_dhw`); cheaper relayout than the
        # minor-dim move to (H, W, D)
        return jnp.moveaxis(cv, 0, 1)
    return jnp.moveaxis(cv, 0, -1)
