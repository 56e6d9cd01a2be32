"""Relative pose, triangulation, essential matrix, P3P/PnP.

Reference parity: `geometry/alignement.h` — `projectPoints` (:44-96, pinhole
x/z, y/z), `reprojectPoints` (:142, closed-form two-view depth from the x and
y constraints, averaged, with non-finite fallback), `reprojectPointsLstSqr`
(:209, per-point 2x2 least squares on the two rays),
`estimateEssentialMatrix` (:275, 8-point + SVD null vector),
`essentialMatrix2Transforms` (:388, U W V^T factorizations),
`selectTransform` (:434, cheirality + reprojection-error tie-break),
`findTransform` (:532), `p3p` (:547,670 — Lambda-Twist, Persson & Nordberg
ECCV 2018), `pnpRefine` (:982, Gauss-Newton on reprojection residuals via
autodiff here) and `pnp` (:1064, P3P hypotheses from the first 3 points
scored by all-point reprojection).

TPU design: everything is batched over (..., N) point sets with jnp; the
Lambda-Twist cubic/eigen steps use closed forms plus fixed-iteration Newton
polish (jit-friendly, no LAPACK eig); hand Jacobians are replaced by
jax.jacfwd.  Points are (N, 2) / (N, 3) row-major arrays.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .core import AffineTransform, unskew
from .rotations import rodrigues_formula


# ---------------------------------------------------------------------------
# Projection / triangulation
# ---------------------------------------------------------------------------

def project_points(pts: jnp.ndarray, transform: AffineTransform | None = None
                   ) -> jnp.ndarray:
    """(..., 3) camera- or scene-frame points -> (..., 2) homogeneous image
    coordinates (x/z, y/z)."""
    if transform is not None:
        pts = transform.apply(pts)
    return pts[..., :2] / pts[..., 2:3]


def reproject_points(transform: AffineTransform, pt_cam_1: jnp.ndarray,
                     pt_cam_2: jnp.ndarray) -> jnp.ndarray:
    """Two-view triangulation: (N, 2) homogeneous coords in both cameras ->
    (N, 3) points in camera-1 frame (`reprojectPoints`,
    `alignement.h:142-184`: solve the x- and y- epipolar depth equations,
    average, fall back to whichever is finite)."""
    R, t = transform.R, transform.t
    x1, y1 = pt_cam_1[..., 0], pt_cam_1[..., 1]
    u2, v2 = pt_cam_2[..., 0], pt_cam_2[..., 1]
    rz = R[2, 0] * x1 + R[2, 1] * y1 + R[2, 2]
    rx = R[0, 0] * x1 + R[0, 1] * y1 + R[0, 2]
    ry = R[1, 0] * x1 + R[1, 1] * y1 + R[1, 2]
    z_a = (t[0] - u2 * t[2]) / (u2 * rz - rx)
    z_b = (t[1] - v2 * t[2]) / (v2 * rz - ry)
    z = (z_a + z_b) / 2.0
    z = jnp.where(jnp.isfinite(z), z, z_a)
    z = jnp.where(jnp.isfinite(z), z, z_b)
    ones = jnp.ones_like(x1)
    return jnp.stack([x1, y1, ones], -1) * z[..., None]


def reproject_points_lstsqr(transform: AffineTransform, pt_cam_1: jnp.ndarray,
                            pt_cam_2: jnp.ndarray) -> jnp.ndarray:
    """Least-squares two-ray triangulation (`reprojectPointsLstSqr`,
    `alignement.h:209-253`): per point, solve for the two ray scales with a
    pseudo-inverted 2x2 normal matrix, return the midpoint."""
    R, t = transform.R, transform.t
    v1 = jnp.concatenate([pt_cam_1, jnp.ones_like(pt_cam_1[..., :1])], -1)
    v2 = jnp.concatenate([pt_cam_2, jnp.ones_like(pt_cam_2[..., :1])], -1)
    v2c1 = v2 @ R  # R^T v2, batched
    b = -(R.T @ t)

    a00 = jnp.sum(v1 * v1, -1)
    a01 = -jnp.sum(v1 * v2c1, -1)
    a11 = jnp.sum(v2c1 * v2c1, -1)
    # normal matrix [[a00, a01], [a01, a11]], rhs A^T b
    r0 = jnp.sum(v1 * b, -1)
    r1 = -jnp.sum(v2c1 * b, -1)
    det = a00 * a11 - a01 * a01
    safe = jnp.abs(det) > 1e-12
    det_s = jnp.where(safe, det, 1.0)
    l0 = jnp.where(safe, (a11 * r0 - a01 * r1) / det_s, 0.0)
    l1 = jnp.where(safe, (-a01 * r0 + a00 * r1) / det_s, 0.0)
    est1 = v1 * l0[..., None]
    est2 = v2c1 * l1[..., None] + b
    return (est1 + est2) / 2.0


# ---------------------------------------------------------------------------
# Essential matrix
# ---------------------------------------------------------------------------

def estimate_essential_matrix(pt_cam_1: jnp.ndarray, pt_cam_2: jnp.ndarray
                              ) -> jnp.ndarray:
    """8-point essential matrix from (N >= 8, 2) homogeneous coordinates
    (`estimateEssentialMatrix`, `alignement.h:275-306`; the row layout
    matches: E contracts as [x2 y2 1]^T E' [x1 y1 1] with the returned
    flattening)."""
    x1, y1 = pt_cam_1[..., 0], pt_cam_1[..., 1]
    x2, y2 = pt_cam_2[..., 0], pt_cam_2[..., 1]
    ones = jnp.ones_like(x1)
    F = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2,
                   x1, y1, ones], 0)          # (9, N)
    # null vector of F^T == left singular vector of F for the smallest sv.
    # full_matrices=False keeps V at (9, N) instead of (N, N) — at large
    # N the full V is an O(N^2) allocation read by nobody; U is square
    # (9, 9) whenever N >= 9, and the exact-minimal N == 8 case pads one
    # zero column so u[:, 8] is the true null vector rather than a
    # silently clamped index
    if F.shape[1] < 9:
        F = jnp.pad(F, ((0, 0), (0, 9 - F.shape[1])))
    u, _, _ = jnp.linalg.svd(F, full_matrices=False)
    e = u[:, 8]
    return e.reshape(3, 3)


def essential_matrix_to_transforms(E: jnp.ndarray
                                   ) -> Tuple[AffineTransform, AffineTransform]:
    """E -> the two candidate (R, t) factorizations
    (`essentialMatrix2Transforms`, `alignement.h:388-430`)."""
    u, s, vt = jnp.linalg.svd(E)
    u = jnp.where(jnp.linalg.det(u) < 0, -u, u)
    v = vt.T
    v = jnp.where(jnp.linalg.det(v) < 0, -v, v)
    W = jnp.asarray([[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ v.T
    R2 = u @ W.T @ v.T
    Wz = W.at[2, 2].set(0.0)
    t1 = unskew(u @ Wz @ u.T)
    return AffineTransform(R1, t1), AffineTransform(R2, -t1)


def select_transform(T1: AffineTransform, T2: AffineTransform,
                     pt_cam_1: jnp.ndarray, pt_cam_2: jnp.ndarray
                     ) -> AffineTransform:
    """Cheirality selection among the 4 (R, t) combinations, with a
    bidirectional reprojection-error tie-break (`selectTransform`,
    `alignement.h:434-530`).  jit-friendly: all four candidates are scored
    and the best valid one selected with arithmetic, no exceptions."""
    def score(R, t):
        cand = AffineTransform(R, t)
        reproj = reproject_points(cand, pt_cam_1, pt_cam_2)
        ok1 = jnp.all(reproj[..., 2] >= 0.0)
        inv = cand.inverse()
        reproj2 = reproject_points(inv, pt_cam_2, pt_cam_1)
        ok2 = jnp.all(reproj2[..., 2] >= 0.0)
        n = pt_cam_1.shape[0]
        err = jnp.linalg.norm(project_points(reproj, cand) - pt_cam_2) / n
        err = err + jnp.linalg.norm(
            project_points(reproj2, inv) - pt_cam_1) / n
        # near-epipole correspondences triangulate to inf depth, which
        # PASSES z >= 0 and then projects to NaN; NaN would win argmin
        err = jnp.where(jnp.isfinite(err), err, jnp.inf)
        return jnp.where(ok1 & ok2, err, jnp.inf)

    Rs = jnp.stack([T1.R, T1.R, T2.R, T2.R])
    ts = jnp.stack([T1.t, T2.t, T1.t, T2.t])
    errs = jax.vmap(score)(Rs, ts)
    best = jnp.argmin(errs)
    return AffineTransform(Rs[best], ts[best])


def find_transform(pt_cam_1: jnp.ndarray, pt_cam_2: jnp.ndarray
                   ) -> AffineTransform:
    """Essential matrix + cheirality in one call (`findTransform`,
    `alignement.h:532-545`)."""
    E = estimate_essential_matrix(pt_cam_1, pt_cam_2)
    T1, T2 = essential_matrix_to_transforms(E)
    return select_transform(T1, T2, pt_cam_1, pt_cam_2)


# ---------------------------------------------------------------------------
# P3P (Lambda-Twist) and PnP
# ---------------------------------------------------------------------------

def _newton_cubic(a, b, c, d, x0, iters: int = 50):
    def body(_, x):
        fx = a * x ** 3 + b * x ** 2 + c * x + d
        dfx = 3 * a * x ** 2 + 2 * b * x + c
        return x - fx / jnp.where(jnp.abs(dfx) > 1e-30, dfx, 1e-30)

    return jax.lax.fori_loop(0, iters, body, x0)


def p3p(pt_cam: jnp.ndarray, pt_world: jnp.ndarray):
    """Lambda-Twist P3P (`p3p`, `alignement.h:670-944`; Persson & Nordberg,
    ECCV 2018).  pt_cam: (3, 3) homogeneous rays (rows are points, last
    component 1 allowed — they are normalized); pt_world: (3, 3) scene
    points.  Returns (Rs (4, 3, 3), ts (4, 3), valid (4,)) world->cam
    candidates.  jit-friendly: fixed 4 solution slots with a validity mask.
    """
    y = pt_cam / jnp.linalg.norm(pt_cam, axis=-1, keepdims=True)
    x1, x2, x3 = pt_world[0], pt_world[1], pt_world[2]
    y1, y2, y3 = y[0], y[1], y[2]

    d12 = x1 - x2
    d13 = x1 - x3
    d23 = x2 - x3
    d12xd23 = jnp.cross(d12, d23)
    X = jnp.stack([d12, d23, d12xd23], -1)
    invX = jnp.linalg.inv(X)

    a12 = jnp.dot(d12, d12)
    a13 = jnp.dot(d13, d13)
    a23 = jnp.dot(d23, d23)

    b12 = jnp.dot(y1, y2)
    b13 = jnp.dot(y1, y3)
    b23 = jnp.dot(y2, y3)

    # Lambda-Twist pencil: D1 = M12 a23 - M23 a12, D2 = M13 a23 - M23 a13,
    # where Mij is the quadratic form of ||l_i y_i - l_j y_j||^2 in the
    # depth vector (l1, l2, l3).
    def M(b, i, j):
        m = jnp.zeros((3, 3))
        m = m.at[i, i].set(1.0).at[j, j].set(1.0)
        m = m.at[i, j].set(-b).at[j, i].set(-b)
        return m

    M12m = M(b12, 0, 1)
    M13m = M(b13, 0, 2)
    M23m = M(b23, 1, 2)

    D1 = M12m * a23 - M23m * a12
    D2 = M13m * a23 - M23m * a13

    # cubic det(D1 + gamma D2) = d0 + c1 g + c2 g^2 + c3 g^3, coefficients
    # recovered by sampling the determinant at g = 0, +-1, 2
    p0 = jnp.linalg.det(D1)
    p1 = jnp.linalg.det(D1 + D2)
    pm1 = jnp.linalg.det(D1 - D2)
    p2 = jnp.linalg.det(D1 + 2.0 * D2)
    d0 = p0
    c2p = (p1 + pm1) / 2.0 - d0
    s = (p1 - pm1) / 2.0                       # = c1 + c3
    c3p = (p2 - d0 - 4.0 * c2p - 2.0 * s) / 6.0
    c1p = s - c3p
    gamma = _newton_cubic(c3p, c2p, c1p, d0, jnp.float32(0.0))

    D0 = D1 + gamma * D2  # rank-2, one zero eigenvalue

    # eigen decomposition knowing one zero eigenvalue
    f = D0.reshape(-1)
    p1c = -f[0] - f[4] - f[8]
    p0c = (-f[1] * f[1] - f[2] * f[2] - f[5] * f[5]
           + f[0] * (f[4] + f[8]) + f[4] * f[8])
    delta = jnp.maximum(p1c * p1c - 4 * p0c, 0.0)
    sq = jnp.sqrt(delta)
    s1 = jnp.where(p1c < 0, (-p1c + sq) / 2, 2 * p0c / (-p1c + sq))
    s2 = jnp.where(p1c < 0, (-p1c - sq) / 2, 2 * p0c / (-p1c - sq))

    def eigvec(lam):
        c = lam * lam + f[0] * f[4] - lam * (f[0] + f[4]) - f[1] * f[1]
        c = jnp.where(jnp.abs(c) > 1e-20, c, 1e-20)
        a1 = (lam * f[2] + f[1] * f[5] - f[2] * f[4]) / c
        a2 = (lam * f[5] + f[1] * f[2] - f[0] * f[5]) / c
        v = jnp.asarray([a1, a2, 1.0])
        return v / jnp.linalg.norm(v)

    bv1 = eigvec(s1)
    bv2 = eigvec(s2)
    swap = jnp.abs(s1) < jnp.abs(s2)
    sig1 = jnp.where(swap, s2, s1)
    sig2 = jnp.where(swap, s1, s2)
    e1 = jnp.where(swap, bv2, bv1)
    e2 = jnp.where(swap, bv1, bv2)

    sp = jnp.sqrt(jnp.maximum(-sig2 / sig1, 0.0))

    def solutions_for(sgn):
        w0 = (e1[0] - sgn * sp * e2[0])
        w1 = (e1[1] - sgn * sp * e2[1])
        w2 = (e1[2] - sgn * sp * e2[2])
        # l1 = w * l3 relationships: plug into M13-based quadric
        # solve a l3^2 + b l3 + c = 0 in terms of tau = l2 / l3
        # Following the paper: parametrize l = l3 * (w0 + w1 tau?, ...)
        # Here we use: the plane w . l = 0 intersected with D1 quadric.
        # Solve for tau from  (w0 l1 + w1 l2 + w2 l3 = 0) =>
        # l1 = -(w1 l2 + w2 l3)/w0
        w0s = jnp.where(jnp.abs(w0) > 1e-12, w0, 1e-12)
        # substitute into M23m * a12 - ... simpler: use quadric
        # q(l) = l^T D1 l = 0 with l = (-(w1 t + w2)/w0, t, 1) * l3
        def qform(A, t):
            l = jnp.asarray([-(w1 * t + w2) / w0s, t, 1.0])
            return l @ A @ l, l

        # coefficients of quadratic in t for l^T D1 l
        qa, _ = qform(D1, 1.0)
        qb_, _ = qform(D1, 0.0)
        qm, _ = qform(D1, -1.0)
        A_ = (qa + qm) / 2 - qb_
        B_ = (qa - qm) / 2
        C_ = qb_
        disc = B_ * B_ - 4 * A_ * C_
        ok = disc >= 0
        sqd = jnp.sqrt(jnp.maximum(disc, 0.0))
        A_s = jnp.where(jnp.abs(A_) > 1e-20, A_, 1e-20)
        taus = jnp.stack([(-B_ + sqd) / (2 * A_s), (-B_ - sqd) / (2 * A_s)])

        def lift(tau):
            l_dir = jnp.asarray([-(w1 * tau + w2) / w0s, tau, 1.0])
            # scale so that ||l1 y1 - l2 y2||^2 = a12
            diffv = l_dir[0] * y1 - l_dir[1] * y2
            den = jnp.dot(diffv, diffv)
            scale = jnp.sqrt(a12 / jnp.maximum(den, 1e-20))
            return l_dir * scale

        ls = jax.vmap(lift)(taus)  # (2, 3)
        valid = ok & jnp.all(ls > 0, -1)
        return ls, valid

    ls_a, va = solutions_for(1.0)
    ls_b, vb = solutions_for(-1.0)
    ls = jnp.concatenate([ls_a, ls_b], 0)          # (4, 3)
    valid = jnp.concatenate([va, vb], 0)

    def to_pose(l):
        z1 = l[0] * y1
        z2 = l[1] * y2
        z3 = l[2] * y3
        dz12 = z1 - z2
        dz23 = z2 - z3
        Y = jnp.stack([dz12, dz23, jnp.cross(dz12, dz23)], -1)
        R = Y @ invX
        t = z1 - R @ x1
        return R, t

    Rs, ts = jax.vmap(to_pose)(ls)
    return Rs, ts, valid


def pnp_refine(R0: jnp.ndarray, t0: jnp.ndarray, pt_cam: jnp.ndarray,
               pt_world: jnp.ndarray, iters: int = 10) -> AffineTransform:
    """Gauss-Newton refinement of a world->cam pose on reprojection residuals
    (`pnpRefine`, `alignement.h:982-1062`), with JAX autodiff replacing the
    hand Jacobian (`JacobianPointProjection`, :946)."""
    from .rotations import inverse_rodrigues_formula

    r0 = inverse_rodrigues_formula(R0)
    params0 = jnp.concatenate([r0, t0])

    def residuals(params):
        R = rodrigues_formula(params[:3])
        t = params[3:]
        proj = project_points(pt_world @ R.T + t)
        return (proj - pt_cam).reshape(-1)

    def body(_, params):
        res = residuals(params)
        J = jax.jacfwd(residuals)(params)
        JtJ = J.T @ J + 1e-8 * jnp.eye(6)
        step = jnp.linalg.solve(JtJ, J.T @ res)
        return params - step

    params = jax.lax.fori_loop(0, iters, body, params0)
    return AffineTransform(rodrigues_formula(params[:3]), params[3:])


def pnp(pt_cam: jnp.ndarray, pt_world: jnp.ndarray, refine: bool = True
        ) -> AffineTransform:
    """PnP: P3P on the first three points, candidates scored by all-point
    reprojection error, optional Gauss-Newton polish (`pnp`,
    `alignement.h:1064-1155`).

    Failure signalling: when every P3P candidate is invalid (collinear
    or degenerate first three points), the returned transform carries
    NaN entries — check ``jnp.isfinite(T.R).all()`` (the jit-traceable
    analogue of the reference's empty optional)."""
    rays = jnp.concatenate([pt_cam[:3], jnp.ones((3, 1))], -1)
    Rs, ts, valid = p3p(rays, pt_world[:3])

    def score(R, t, ok):
        cam_pts = pt_world @ R.T + t
        proj = project_points(cam_pts)
        err = jnp.sum((proj - pt_cam) ** 2)
        err = jnp.where(jnp.isfinite(err), err, jnp.inf)
        err = jnp.where(jnp.all(cam_pts[..., 2] > 0), err, jnp.inf)
        return jnp.where(ok, err, jnp.inf)

    errs = jax.vmap(score)(Rs, ts, valid)
    best = jnp.argmin(errs)
    R, t = Rs[best], ts[best]
    if refine:
        return pnp_refine(R, t, pt_cam, pt_world)
    return AffineTransform(R, t)
