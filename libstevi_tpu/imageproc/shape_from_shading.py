"""Shape from shading.

Reference parity: `imageProcessing/shapeFromShading.h` —

  * `estimate_light_direction_from_shading` — `estimateLightDirection`
    (:1113): Gaussian low-pass, separable finite differences, principal
    gradient direction by SVD, sign from the intensity centroid, 45-degree
    elevation assumption.
  * `initial_normal_map_estimate` — `initialNormalMapEstimate` (:34):
    Sobel gradients, per-pixel quadratic for the two unit normals whose
    tangential direction follows the gradient, greedy selection by
    neighbour continuity with an upward-z preference.
  * `normal_map_from_single_shading_image` (:224) and
    `normal_map_from_intrinsic_decomposition` (:452): Gauss-Newton on the
    energy  ||<ld, n> - s||^2 + lambda_diff ||grad n||^2
    + lambda_norm (|n|^2-1)^2  (+ lambda_dir edge-alignment term for the
    decomposition variant), normalized output.
  * `rectify_normal_map` (:768), `height_from_normal_map` (:836),
    `flatten_height_map_in_area_of_interest` (:973).
  * `gradient_based_edges` — `edgesDetection.h:39` (quantile threshold on
    sign-aligned aggregated channel gradients).

TPU design: every solver is matrix-free — the reference's Eigen sparse
matrices (P, Dx, Dy, D, N) become stencil/rank-1 operators applied with
rolls and einsums, and the sparse LU / CG solves become jit-compiled
conjugate-gradient loops (`lax.while_loop`).  The sequential greedy root
selection of the initial estimate becomes a row scan: rows are selected
in parallel against the final row above plus a provisional left
neighbour (two vectorized passes per row) instead of the reference's
strictly sequential raster order.

Documented deviations (reference bugs fixed rather than replicated):
  * `shapeFromShading.h:293` flips the data-term sign (P -= ld), driving
    <ld, n> = -s; the decomposition variant (:526) uses the physical
    +ld.  We use + in both.
  * :331-359 accumulates BOTH axis differences into the same matrix Dx
    (Dy stays empty), penalizing ||d_row n + d_col n||^2; we penalize the
    two axis differences separately (the declared intent).
  * :385 writes the norm-penalty Hessian diagonal as 4*quadr + 8*x
    (missing a factor x); we use the exact Gauss-Newton term
    4*quadr*I + 8*n n^T.
  * :617-621 documents a 90-degree gradient rotation for the edge
    constraint but applies the unrotated gradient; we rotate, so the
    normal's tangential component aligns with the guide gradient.
  * :866 computes the y fallback sign from nx (copy-paste typo); we use
    ny.
  * :1080-1092 subtracts the pre-negation minimum after the convexity
    flip; we re-derive the minimum of the returned values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .convolutions import convolve_2d, PaddingInfos, PaddingType
from .filters import (gaussian_filter_taps, finite_differences_kernel,
                      extend_linear_kernel)

_PM1 = PaddingInfos(1, mode=PaddingType.MIRROR)
_P0 = PaddingInfos(0)


def _ref_gradients(img: jnp.ndarray):
    """The reference gradient pair (`shapeFromShading.h:49-74`,
    `edgesDetection.h:47-71`): correlation with the two smoothed
    difference kernels; channel 0 differentiates along columns, channel 1
    along rows (both negated forward-central, as in the reference)."""
    k0 = jnp.asarray([[1., 0., -1.], [2., 0., -2.], [1., 0., -1.]])
    k1 = jnp.asarray([[1., 2., 1.], [0., 0., 0.], [-1., -2., -1.]])
    pads = (_PM1, _PM1)
    return convolve_2d(img, k0, pads), convolve_2d(img, k1, pads)


# ---------------------------------------------------------------------------
# Light direction
# ---------------------------------------------------------------------------

def estimate_light_direction_from_shading(shading: jnp.ndarray,
                                          low_pass_radius: int = 3
                                          ) -> jnp.ndarray:
    """Estimate the (3,) light direction from a single shading image
    (`shapeFromShading.h:1113`): principal direction of the smoothed
    image gradients, oriented toward the intensity centroid, with unit z
    (45-degree elevation)."""
    s = shading.astype(jnp.float32)
    H, W = s.shape
    if low_pass_radius >= 1:
        sigma = float(low_pass_radius + 1) / 2
        taps = jnp.asarray(gaussian_filter_taps(sigma, low_pass_radius,
                                                normalize=False))
        pad = PaddingInfos(low_pass_radius, mode=PaddingType.MIRROR)
        lp = convolve_2d(s, taps[:, None], (pad, _P0))
        lp = convolve_2d(lp, taps[None, :], (_P0, pad))
    else:
        lp = s
    fd = jnp.asarray(finite_differences_kernel())
    el = jnp.asarray(extend_linear_kernel())
    d0 = convolve_2d(lp, fd[:, None], (_PM1, _P0))
    d0 = convolve_2d(d0, el[None, :], (_P0, _PM1))
    d1 = convolve_2d(lp, el[:, None], (_PM1, _P0))
    d1 = convolve_2d(d1, fd[None, :], (_P0, _PM1))

    dirs = jnp.stack([d0.ravel(), d1.ravel()], axis=1)
    # principal right-singular vector of the (N, 2) gradient matrix
    _, vecs = jnp.linalg.eigh(dirs.T @ dirs)
    direction = vecs[:, -1]
    direction = direction / jnp.linalg.norm(direction)

    ii = jnp.arange(H, dtype=jnp.float32)[:, None]
    jj = jnp.arange(W, dtype=jnp.float32)[None, :]
    wsum = jnp.sum(lp)
    centroid = jnp.stack([jnp.sum(ii * lp), jnp.sum(jj * lp)]) / wsum
    centroid = centroid - jnp.asarray([H, W], jnp.float32) / 2
    direction = jnp.where(jnp.dot(direction, centroid) < 0,
                          -direction, direction)
    # light opposes the gradient; first image axis is y; 45-degree z
    return jnp.stack([-direction[1], direction[0],
                      jnp.linalg.norm(direction)])


# ---------------------------------------------------------------------------
# Initial estimate
# ---------------------------------------------------------------------------

def initial_normal_map_estimate(shading: jnp.ndarray, light: jnp.ndarray
                                ) -> jnp.ndarray:
    """Per-pixel two-root normal candidates + greedy continuity selection
    (`shapeFromShading.h:34-221`).  The light is rescaled so the maximum
    shading maps to a fronto-parallel surface; each pixel solves the
    quadratic for the unit normal whose tangential part follows the local
    gradient; the root closer to the already-selected neighbours wins,
    with a z >= 0 override."""
    s = shading.astype(jnp.float32)
    H, W = s.shape
    ld = jnp.asarray(light, jnp.float32)
    ld = ld / jnp.linalg.norm(ld) * jnp.max(s)

    gx, gy = _ref_gradients(s)
    branch = jnp.abs(gx) < jnp.abs(gy)          # v parameterizes y else x
    raw = jnp.where(branch, gx / gy, gy / gx)
    scale = jnp.where(jnp.isfinite(raw), raw, 1.0)
    lv = jnp.where(branch, scale * ld[0] + ld[1], scale * ld[1] + ld[0])
    tr = -lv / ld[2]                            # z = tr * v + s
    a = tr * tr + scale * scale + 1.0           # |n| = 1 quadratic in v
    b = 2.0 * tr * s
    c = s * s - 1.0
    sq = jnp.sqrt(jnp.maximum(b * b - 4.0 * a * c, 0.0))

    cands = []
    for sign in (1.0, -1.0):
        v = (-b + sign * sq) / (2.0 * a)
        z = tr * v + s
        o = scale * v
        x = jnp.where(branch, o, v)
        y = jnp.where(branch, v, o)
        cands.append(jnp.stack([x, y, z], axis=-1))
    cand = jnp.stack(cands, axis=-2)            # (H, W, 2, 3)

    def row_step(prev, xs):
        crow, first = xs                        # (W, 2, 3)
        d_up = jnp.linalg.norm(crow - prev[:, None, :], axis=-1)
        d_up = jnp.where(first, 0.0, d_up)
        sel0 = jnp.argmin(d_up, axis=-1)        # provisional: up only
        est0 = jnp.take_along_axis(crow, sel0[:, None, None], 1)[:, 0]
        left = jnp.concatenate([est0[:1], est0[:-1]], axis=0)
        d_left = jnp.linalg.norm(crow - left[:, None, :], axis=-1)
        d_left = d_left.at[0].set(0.0)
        sel = jnp.argmin(d_up + d_left, axis=-1)
        zsel = jnp.take_along_axis(crow[..., 2], sel[:, None], 1)[:, 0]
        sel = jnp.where(zsel < 0, 1 - sel, sel)
        est = jnp.take_along_axis(crow, sel[:, None, None], 1)[:, 0]
        return est, est

    first = jnp.zeros((H,), bool).at[0].set(True)
    _, est = jax.lax.scan(row_step, jnp.zeros((W, 3), jnp.float32),
                          (cand, first))
    return est


# ---------------------------------------------------------------------------
# Matrix-free operators + CG
# ---------------------------------------------------------------------------

def _dr(n):
    """Central difference along rows, one-sided at the edges (the
    reference's Dx stencil, `shapeFromShading.h:314-330`)."""
    up = jnp.concatenate([n[:1], n[:-1]], axis=0)
    dn = jnp.concatenate([n[1:], n[-1:]], axis=0)
    return dn - up


def _dc(n):
    up = jnp.concatenate([n[:, :1], n[:, :-1]], axis=1)
    dn = jnp.concatenate([n[:, 1:], n[:, -1:]], axis=1)
    return dn - up


def _cg(apply_fn, b, x0, iters: int, tol: float = 1e-10):
    """Jit-compiled conjugate gradient on pytree-free arrays."""
    r = b - apply_fn(x0)
    p = r
    rs = jnp.sum(r * r)

    def cond(st):
        _, _, _, rs, k = st
        return (k < iters) & (rs > tol)

    def body(st):
        x, r, p, rs, k = st
        ap = apply_fn(p)
        alpha = rs / jnp.maximum(jnp.sum(p * ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.sum(r * r)
        p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
        return x, r, p, rs_new, k + 1

    x, *_ = jax.lax.while_loop(cond, body, (x0, r, p, rs, 0))
    return x


def _smooth_apply(v, lam_diff):
    drT = jax.linear_transpose(_dr, v)
    dcT = jax.linear_transpose(_dc, v)
    return lam_diff * (drT(_dr(v))[0] + dcT(_dc(v))[0])


# ---------------------------------------------------------------------------
# Normal-map solvers
# ---------------------------------------------------------------------------

def _solve_normals(s, ld, lam_norm, lam_diff, n_iter, incr_tol, n0,
                   edge_dir=None, lam_dir=0.0):
    """Gauss-Newton on the shading energy with matrix-free CG inner
    solves.  ``edge_dir`` is an optional (H, W, 2) field of unit
    constraint directions d with weight lam_dir enforcing
    <d, n_xy> = 0 at edge pixels (zeros elsewhere)."""
    H, W = s.shape

    def lin_apply(v, n_cur):
        # data: ld ld^T per pixel
        av = ld[None, None, :] * jnp.einsum("hwc,c->hw", v, ld)[..., None]
        av = av + _smooth_apply(v, lam_diff)
        # GN term of (|n|^2 - 1)^2, made PSD with |q| so the inner CG
        # stays valid where |n| < 1 (the reference's LU tolerates the
        # indefinite 4 q I + 8 n n^T; CG does not)
        q = jnp.sum(n_cur * n_cur, -1, keepdims=True) - 1.0
        av = av + lam_norm * (4.0 * jnp.abs(q) * v + 8.0 * n_cur
                              * jnp.sum(n_cur * v, -1, keepdims=True))
        if edge_dir is not None:
            e = jnp.einsum("hwc,hwc->hw", edge_dir, v[..., :2])
            av = av.at[..., :2].add(lam_dir * edge_dir * e[..., None])
        return av

    def rhs(n_cur):
        # b = L^T s - A0 n - lam_norm grad_norm  (grad of the quartic)
        b = ld[None, None, :] * s[..., None]
        b = b - ld[None, None, :] * jnp.einsum("hwc,c->hw", n_cur,
                                               ld)[..., None]
        b = b - _smooth_apply(n_cur, lam_diff)
        q = jnp.sum(n_cur * n_cur, -1, keepdims=True) - 1.0
        b = b - lam_norm * 4.0 * q * n_cur
        if edge_dir is not None:
            e = jnp.einsum("hwc,hwc->hw", edge_dir, n_cur[..., :2])
            b = b.at[..., :2].add(-lam_dir * edge_dir * e[..., None])
        return b

    n_inner = min(80, 3 * H * W)

    def outer_cond(st):
        _, k, dn = st
        return (k < n_iter) & (dn > incr_tol)

    def outer_body(st):
        n, k, _ = st
        delta = _cg(lambda v: lin_apply(v, n), rhs(n),
                    jnp.zeros_like(n), n_inner)
        n = n + delta
        dn = jnp.linalg.norm(delta) / (3 * H * W)
        return n, k + 1, dn

    n, _, _ = jax.lax.while_loop(outer_cond, outer_body,
                                 (n0, 0, jnp.float32(jnp.inf)))
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True),
                           1e-12)


def normal_map_from_single_shading_image(shading: jnp.ndarray,
                                         light: jnp.ndarray,
                                         lambda_norm: float = 1.0,
                                         lambda_diff: float = 0.25,
                                         n_iter: int = 50,
                                         incr_tol: float = 1e-6
                                         ) -> jnp.ndarray:
    """(H, W, 3) unit normal map from one shading image under a known
    light (`shapeFromShading.h:224-449`): Gauss-Newton on the shading /
    smoothness / unit-norm energy, starting from the zero field as the
    reference does."""
    s = shading.astype(jnp.float32)
    ld = jnp.asarray(light, jnp.float32)
    ld = ld / jnp.linalg.norm(ld) * jnp.max(s)
    n0 = jnp.zeros(s.shape + (3,), jnp.float32)
    return _solve_normals(s, ld, float(lambda_norm), float(lambda_diff),
                          n_iter, float(incr_tol), n0)


def gradient_based_edges(guide: jnp.ndarray, prop_edges: float = 0.05):
    """Top-``prop_edges`` gradient pixels of a (H, W, C) guide image
    (`edgesDetection.h:39-130`).  Channel gradients are sign-aligned
    before aggregation so orientation matters but direction does not.
    Returns (mask (H, W) bool, gradients (H, W, 2) zeroed off-mask)."""
    g = guide.astype(jnp.float32)
    if g.ndim == 2:
        g = g[..., None]
    d0 = jnp.zeros(g.shape[:2], jnp.float32)
    d1 = jnp.zeros(g.shape[:2], jnp.float32)
    for ch in range(g.shape[-1]):
        c0, c1 = _ref_gradients(g[..., ch])
        coeff = jnp.where(d0 * c0 + d1 * c1 < 0, -1.0, 1.0)
        d0 = d0 + coeff * c0
        d1 = d1 + coeff * c1
    ampl = d0 * d0 + d1 * d1
    thresh = jnp.quantile(ampl.ravel(), 1.0 - prop_edges)
    # the reference compares >= (`edgesDetection.h:141`); we additionally
    # require a non-zero gradient so a mostly-flat image (quantile 0)
    # cannot flag every pixel as an edge with an undefined direction
    mask = (ampl >= thresh) & (ampl > 0)
    grads = jnp.where(mask[..., None], jnp.stack([d0, d1], -1), 0.0)
    return mask, grads


def normal_map_from_intrinsic_decomposition(shading: jnp.ndarray,
                                            guide: jnp.ndarray,
                                            light: jnp.ndarray,
                                            lambda_norm: float = 1.0,
                                            lambda_diff: float = 0.25,
                                            lambda_dir: float = 0.25,
                                            prop_edges: float = 0.05,
                                            n_iter: int = 50,
                                            incr_tol: float = 1e-6
                                            ) -> jnp.ndarray:
    """Normal map from an intrinsic-decomposition shading image with a
    guide-image edge alignment constraint
    (`shapeFromShading.h:452-765`): at strong guide edges the normal's
    tangential component must align with the gradient (the 90-degree
    rotated gradient dotted with n_xy is penalized), initialization from
    `initial_normal_map_estimate`."""
    s = shading.astype(jnp.float32)
    ld = jnp.asarray(light, jnp.float32)
    ld = ld / jnp.linalg.norm(ld) * jnp.max(s)

    mask, grads = gradient_based_edges(guide, prop_edges)
    ampl = jnp.maximum(jnp.linalg.norm(grads, axis=-1, keepdims=True),
                       1e-12)
    # rotate 90 degrees: cross(grad, n_xy) = 0 <=> <grad_perp, n_xy> = 0
    perp = jnp.stack([-grads[..., 1], grads[..., 0]], -1) / ampl
    perp = jnp.where(mask[..., None], perp, 0.0)
    n_edges = jnp.maximum(jnp.sum(mask), 1)
    rescale = (s.shape[0] * s.shape[1]) / n_edges

    n0 = initial_normal_map_estimate(shading, ld)
    n0 = jnp.where(jnp.isfinite(n0), n0,
                   jnp.asarray([0.0, 0.0, 1.0])[None, None, :])
    return _solve_normals(s, ld, float(lambda_norm), float(lambda_diff),
                          n_iter, float(incr_tol), n0, edge_dir=perp,
                          lam_dir=float(lambda_dir) * rescale)


# ---------------------------------------------------------------------------
# Normal-map post-processing
# ---------------------------------------------------------------------------

def rectify_normal_map(normalmap: jnp.ndarray, mask: jnp.ndarray
                       ) -> jnp.ndarray:
    """Rotate the map so the masked mean normal becomes vertical
    (`shapeFromShading.h:768-833`, Rodrigues rotation about
    mean x z-axis)."""
    from ..geometry.rotations import rodrigues_formula
    n = normalmap.astype(jnp.float32)
    m = mask[..., None].astype(jnp.float32)
    mean = jnp.sum(n * m, axis=(0, 1)) / jnp.maximum(jnp.sum(m), 1.0)
    vertical = jnp.asarray([0.0, 0.0, 1.0])
    axis = jnp.cross(mean, vertical)
    alpha = jnp.arccos(jnp.clip(jnp.dot(mean, vertical)
                                / jnp.maximum(jnp.linalg.norm(mean), 1e-12),
                                -1.0, 1.0))
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12)
    R = rodrigues_formula(alpha * axis)
    return jnp.einsum("ab,hwb->hwa", R, n)


def height_from_normal_map(normalmap: jnp.ndarray, max_diff: float = 50.0
                           ) -> jnp.ndarray:
    """Least-squares height integration (`shapeFromShading.h:836-969`):
    forward-difference observations equal the mean of adjacent slopes
    n_x/n_z, n_y/n_z (clamped to +-max_diff), one anchor at (0, 0); the
    normal equations are solved matrix-free with CG (the reference uses
    a sparse LU)."""
    n = normalmap.astype(jnp.float32)
    H, W = n.shape[:2]
    nz = n[..., 2]

    def _slope(comp):
        d = comp / nz
        fallback = jnp.sign(comp) * max_diff
        return jnp.where(jnp.isfinite(d) & (jnp.abs(d) <= max_diff),
                         d, fallback)

    dx = _slope(n[..., 0])
    dy = _slope(n[..., 1])
    bx = (dx[:, :-1] + dx[:, 1:]) / 2           # (H, W-1)
    by = (dy[:-1, :] + dy[1:, :]) / 2           # (H-1, W)

    def gx(z):
        return z[:, 1:] - z[:, :-1]

    def gy(z):
        return z[1:, :] - z[:-1, :]

    like = jnp.zeros((H, W), jnp.float32)
    gxT = jax.linear_transpose(gx, like)
    gyT = jax.linear_transpose(gy, like)

    def apply_fn(z):
        out = gxT(gx(z))[0] + gyT(gy(z))[0]
        return out.at[0, 0].add(z[0, 0])        # anchor z[0,0] = 0

    b = gxT(bx)[0] + gyT(by)[0]
    return _cg(apply_fn, b, like, iters=4 * (H + W), tol=1e-8)


def flatten_height_map_in_area_of_interest(base_height: jnp.ndarray,
                                           mask: jnp.ndarray,
                                           ensure_convex: bool = False
                                           ) -> jnp.ndarray:
    """Remove the best-fit plane over the masked area, optionally flip so
    the region is convex-up, and shift the masked minimum to zero
    (`shapeFromShading.h:973-1108`); outside the mask the result is 0."""
    h = base_height.astype(jnp.float32)
    H, W = h.shape
    m = mask.astype(jnp.float32)
    ii = jnp.arange(H, dtype=jnp.float32)[:, None] * jnp.ones((1, W))
    jj = jnp.ones((H, 1)) * jnp.arange(W, dtype=jnp.float32)[None, :]
    one = jnp.ones((H, W), jnp.float32)
    basis = jnp.stack([ii, jj, one], axis=-1)            # (H, W, 3)
    wb = basis * m[..., None]
    M = jnp.einsum("hwa,hwb->ab", wb, basis)
    r = jnp.einsum("hwa,hw->a", wb, h)
    coeffs = jnp.linalg.solve(M, r)
    flat = (h - jnp.einsum("hwa,a->hw", basis, coeffs)) * m

    if ensure_convex:
        # reference parity (`shapeFromShading.h:1050-1075`): the vote
        # kernel is the all-positive [[1,1,1],[1,8,1],[1,1,1]] smoother,
        # i.e. the sign of the SMOOTHED plane-removed height, majority
        # over the mask.  Note this is not a curvature test: it chooses
        # the flip where most of the region sits ABOVE the fitted plane
        # (a narrow peak over a wide tail gets inverted to a wide
        # plateau with a dent — the reference's concavity-ambiguity
        # disambiguation, replicated as-is).
        k = jnp.asarray([[1., 1., 1.], [1., 8., 1.], [1., 1., 1.]])
        conv = convolve_2d(flat, k, (_PM1, _PM1))
        score = jnp.sum(jnp.where(conv >= 0, 1.0, -1.0) * m)
        flat = jnp.where(score < 0, -flat, flat)

    big = jnp.float32(jnp.finfo(jnp.float32).max)
    mn = jnp.min(jnp.where(mask, flat, big))
    return jnp.where(mask, flat - mn, 0.0)


# ---------------------------------------------------------------------------
# Compact legacy surface (round-1 API, kept for callers/tests)
# ---------------------------------------------------------------------------

def estimate_light_direction(image: jnp.ndarray, normals: jnp.ndarray
                             ) -> jnp.ndarray:
    """Least-squares Lambertian light from KNOWN normals (a convenience
    inverse of the shading model; for the reference's from-shading-only
    estimator see `estimate_light_direction_from_shading`)."""
    I = image.astype(jnp.float32).ravel()
    N = normals.reshape(-1, 3)
    return jnp.linalg.lstsq(N, I)[0]


def initial_normal_map(image: jnp.ndarray, light: jnp.ndarray
                       ) -> jnp.ndarray:
    """Linearized initial normals: start from the light direction scaled to
    match the observed shading, bent toward the image gradient."""
    I = image.astype(jnp.float32)
    gy = jnp.gradient(I, axis=0)
    gx = jnp.gradient(I, axis=1)
    ct = jnp.clip(I / jnp.maximum(jnp.linalg.norm(light), 1e-6), 0.0, 1.0)
    st = jnp.sqrt(1.0 - ct * ct)
    g = jnp.stack([gy, gx], -1)
    gn = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-6)
    n = jnp.stack([-gn[..., 1] * st, -gn[..., 0] * st, ct], -1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def refine_normals(image: jnp.ndarray, normals0: jnp.ndarray,
                   light: jnp.ndarray, smoothness: float = 0.1,
                   iters: int = 200, lr: float = 0.05) -> jnp.ndarray:
    """Minimize ||n . L - I||^2 + w ||grad n||^2 over unit normals
    (projected gradient descent; the reference-parity Gauss-Newton solver
    is `normal_map_from_single_shading_image`)."""
    I = image.astype(jnp.float32)
    L = jnp.asarray(light, jnp.float32)

    def energy(n):
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6)
        shade = jnp.einsum("hwc,c->hw", n, L)
        data = jnp.sum((shade - I) ** 2)
        gx = n[:, 1:] - n[:, :-1]
        gy = n[1:, :] - n[:-1, :]
        return data + smoothness * (jnp.sum(gx * gx) + jnp.sum(gy * gy))

    g = jax.grad(energy)

    def body(_, n):
        n = n - lr * g(n)
        return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True),
                               1e-6)

    return jax.lax.fori_loop(0, iters, body, normals0)


def integrate_normals(normals: jnp.ndarray) -> jnp.ndarray:
    """Normals -> height via the Frankot-Chellappa integrability projection
    (FFT fast path; the reference-parity least-squares integration is
    `height_from_normal_map`).  Jitted: eager complex FFT ops are
    unimplemented on the TPU backend."""
    return jax.jit(_integrate_normals_impl)(normals)


def _integrate_normals_impl(normals: jnp.ndarray) -> jnp.ndarray:
    n = normals.astype(jnp.float32)
    nz = jnp.where(jnp.abs(n[..., 2]) > 1e-4, n[..., 2], 1e-4)
    p = -n[..., 0] / nz   # dz/drow
    q = -n[..., 1] / nz   # dz/dcol
    H, W = p.shape
    wy = jnp.fft.fftfreq(H) * 2 * jnp.pi
    wx = jnp.fft.fftfreq(W) * 2 * jnp.pi
    WY, WX = jnp.meshgrid(wy, wx, indexing="ij")
    denom = WY * WY + WX * WX
    denom = denom.at[0, 0].set(1.0)
    Fz = (-1j * WY * jnp.fft.fft2(p) - 1j * WX * jnp.fft.fft2(q)) / denom
    Fz = Fz.at[0, 0].set(0.0)
    return jnp.real(jnp.fft.ifft2(Fz))


def shape_from_shading(image: jnp.ndarray, light: jnp.ndarray,
                       smoothness: float = 0.1, iters: int = 200):
    """Full pipeline: initial estimate -> refinement -> height integration.
    Returns (normals, height)."""
    n0 = initial_normal_map(image, jnp.asarray(light, jnp.float32))
    n = refine_normals(image, n0, light, smoothness, iters)
    return n, integrate_normals(n)
