"""Point-cloud map estimation from per-coordinate scalar observations.

Reference parity: `geometry/pointcloudalignment.h` — the observation model
is ``obs_k = selected_coordinate(T(pts[:, idx_k]))`` (each observation pins
one coordinate axis of one transformed point):
  * `estimateAffineMap` (:33: 12-parameter closed-form LSQ with pseudo
    inverse, offset at identity),
  * `estimateTranslationMap` (:376), `estimateScaleMap` (:436),
    `estimateRotationMap` (:494) — reduced closed forms,
  * `estimateShapePreservingMap` (:739: damped Gauss-Newton on the 7-DoF
    similarity with small-angle rotation updates, scale updated as
    exp(delta), left-composition of the increment).

TPU design: the axis selection becomes a one-hot (N, 3) matrix so every
solver is dense linear algebra over (N, k) design matrices (MXU); the GN
iteration is a `lax.fori_loop`.  The distributed multi-view version (per
shard JtJ partial sums + psum) lives in `parallel/schur.py`.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .core import skew, AffineTransform, IterativeTermination
from .rotations import ShapePreservingTransform, angle_axis_rotate


class Axis(enum.Enum):
    X = 0
    Y = 1
    Z = 2


def _axis_onehot(coordinate) -> jnp.ndarray:
    idx = jnp.asarray([c.value if isinstance(c, Axis) else int(c)
                       for c in coordinate], jnp.int32)
    return jax.nn.one_hot(idx, 3, dtype=jnp.float32), idx


def _pinv_solve(A, b, tol=1e-4):
    """x = pinv(A^T A) A^T b with the reference's singular-value cutoff."""
    AtA = A.T @ A
    u, s, vt = jnp.linalg.svd(AtA)
    s_inv = jnp.where(jnp.abs(s) > tol, 1.0 / jnp.where(s != 0, s, 1.0), 0.0)
    return vt.T @ (s_inv * (u.T @ (A.T @ b)))


def estimate_affine_map(obs: jnp.ndarray, pts: jnp.ndarray,
                        idxs: jnp.ndarray, coordinate) -> AffineTransform:
    """Closed-form 12-parameter affine map (`estimateAffineMap`,
    `pointcloudalignment.h:33-90`).  pts: (3, M); obs, idxs, coordinate
    aligned length-N."""
    onehot, axis_idx = _axis_onehot(coordinate)
    P = pts[:, jnp.asarray(idxs, jnp.int32)].T          # (N, 3)
    N = P.shape[0]
    A = jnp.zeros((N, 12), jnp.float32)
    for a in range(3):
        sel = onehot[:, a:a + 1]
        A = A.at[:, 3 * a:3 * a + 3].set(sel * P)
        A = A.at[:, 9 + a].set(sel[:, 0])
    offset = jnp.zeros(12).at[0].set(1.0).at[4].set(1.0).at[8].set(1.0)
    x = _pinv_solve(A, obs - A @ offset) + offset
    R = x[:9].reshape(3, 3)
    return AffineTransform(R, x[9:])


def estimate_translation_map(obs, pts, idxs, coordinate) -> jnp.ndarray:
    """Closed-form translation (`estimateTranslationMap`, :376)."""
    onehot, axis_idx = _axis_onehot(coordinate)
    P = pts[:, jnp.asarray(idxs, jnp.int32)].T
    picked = jnp.take_along_axis(P, axis_idx[:, None], 1)[:, 0]
    r = obs - picked
    counts = jnp.maximum(jnp.sum(onehot, 0), 1.0)
    return (onehot * r[:, None]).sum(0) / counts


def estimate_scale_map(obs, pts, idxs, coordinate) -> jnp.ndarray:
    """Closed-form scale (`estimateScaleMap`, :436): least-squares s for
    obs = s * coord."""
    _, axis_idx = _axis_onehot(coordinate)
    P = pts[:, jnp.asarray(idxs, jnp.int32)].T
    picked = jnp.take_along_axis(P, axis_idx[:, None], 1)[:, 0]
    return jnp.sum(picked * obs) / jnp.maximum(jnp.sum(picked * picked),
                                               1e-12)


def estimate_rotation_map(obs, pts, idxs, coordinate, iters: int = 50,
                          damping: float = 0.5) -> jnp.ndarray:
    """Gauss-Newton rotation-only map (`estimateRotationMap`, :494)."""
    _, axis_idx = _axis_onehot(coordinate)
    ids = jnp.asarray(idxs, jnp.int32)

    def body(_, r):
        tp = angle_axis_rotate(r, pts.T).T           # (3, M)
        tsel = tp[:, ids].T                          # (N, 3)
        f0 = jnp.take_along_axis(tsel, axis_idx[:, None], 1)[:, 0]
        S = skew(tsel)                               # (N, 3, 3)
        rows = jnp.take_along_axis(
            S, axis_idx[:, None, None].repeat(3, -1), 1)[:, 0, :]
        A = -rows
        delta = _pinv_solve(A, obs - f0, tol=1e-6) * damping
        return _compose_rotations(delta, r)

    return jax.lax.fori_loop(0, iters, body, jnp.zeros(3))


def _compose_rotations(delta_r, r):
    from .rotations import (axis_angle_to_quaternion, quaternion_product,
                            quaternion_to_axis_angle)
    q = quaternion_product(axis_angle_to_quaternion(delta_r),
                           axis_angle_to_quaternion(r))
    return quaternion_to_axis_angle(q)


@dataclass
class ShapePreservingResult:
    transform: ShapePreservingTransform
    status: IterativeTermination


def estimate_shape_preserving_map(obs: jnp.ndarray, pts: jnp.ndarray,
                                  idxs, coordinate, n_steps: int = 50,
                                  incr_limit: float = 1e-8,
                                  damping: float = 0.5,
                                  damping_scale: float = 0.1
                                  ) -> ShapePreservingResult:
    """Damped Gauss-Newton 7-DoF similarity (`estimateShapePreservingMap`,
    `pointcloudalignment.h:739-835`): parameters (rx, ry, rz, tx, ty, tz,
    log s), left-composed small increments, SVD pseudo-inverse normal solve.
    """
    onehot, axis_idx = _axis_onehot(coordinate)
    ids = jnp.asarray(idxs, jnp.int32)
    N = obs.shape[0]

    def step(state):
        r, t, s, it, done = state
        cur = ShapePreservingTransform(r, t, s)
        tp = cur.apply(pts.T).T                      # (3, M)
        tsel = tp[:, ids].T                          # (N, 3)
        f0 = jnp.take_along_axis(tsel, axis_idx[:, None], 1)[:, 0]
        S = skew(tsel)
        rows = jnp.take_along_axis(
            S, axis_idx[:, None, None].repeat(3, -1), 1)[:, 0, :]
        A = jnp.concatenate([-rows, onehot, f0[:, None]], 1)   # (N, 7)
        delta = _pinv_solve(A, obs - f0, tol=1e-6)
        delta = delta.at[:6].multiply(damping).at[6].multiply(damping_scale)
        change = ShapePreservingTransform(delta[:3], delta[3:6],
                                          jnp.exp(delta[6]))
        new = change * cur
        # convergence measures the UNDAMPED step: each component divides
        # by its own damping (a single /damping under-measured the scale
        # increment by damping_scale/damping and could declare
        # convergence while the scale still moved)
        und = jnp.concatenate([delta[:6] / damping,
                               delta[6:] / damping_scale])
        converged = jnp.linalg.norm(und) < incr_limit
        return (new.r, new.t, new.s, it + 1, done | converged)

    def cond(state):
        return (~state[4]) & (state[3] < n_steps)

    init = (jnp.zeros(3), jnp.zeros(3), jnp.asarray(1.0), jnp.int32(0),
            jnp.bool_(False))
    r, t, s, it, done = jax.lax.while_loop(cond, step, init)
    try:
        status = IterativeTermination.CONVERGED if bool(done) \
            else IterativeTermination.MAX_STEP_REACHED
    except jax.errors.TracerBoolConversionError:
        status = None                  # inside jit/vmap: done is traced
    return ShapePreservingResult(ShapePreservingTransform(r, t, s), status)
