"""Rotations, rigid-body and similarity transforms.

Reference parity: `geometry/rotations.h` — `rodriguezFormula` (:31),
`angleAxisRotate` (:47), `inverseRodriguezFormula` (:61),
`diffRodriguezLieAlgebra` (:127), `axisAngleToQuaternion` (:208, [w,x,y,z]),
`quaternionToAxisAngle` (:271), `RigidBodyTransform` (:279; r,t on the SO(3)
manifold), `interpolateRigidBodyTransformOnManifold` (:424),
`ShapePreservingTransform` (:439; r,t,s 7-DoF similarity), Euler XYZ/ZYX
(:539-568).

TPU design: all functions broadcast over leading batch dims and are smooth
everywhere jit needs them to be — small-angle branches are `jnp.where`
selects with Taylor fallbacks, so gradients through theta ~= 0 are finite
(the reference's hand Jacobians `rotations.h:127-231` are replaced by JAX
autodiff; `diff_rodrigues_lie_algebra` is kept for API parity).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .core import skew, unskew, AffineTransform

_EPS = 1e-6


def _safe_norm(r: jnp.ndarray):
    """norm with a gradient-safe sqrt at 0."""
    sq = jnp.sum(r * r, axis=-1)
    safe = jnp.where(sq > 0, sq, 1.0)
    return jnp.where(sq > 0, jnp.sqrt(safe), 0.0)


def rodrigues_formula(r: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3)."""
    theta = _safe_norm(r)[..., None, None]
    m = skew(r)
    eye = jnp.broadcast_to(jnp.eye(3), m.shape)
    small = theta < _EPS
    theta_s = jnp.where(small, 1.0, theta)
    a = jnp.where(small, 1.0, jnp.sin(theta_s) / theta_s)
    b = jnp.where(small, 0.5, (1.0 - jnp.cos(theta_s)) / (theta_s * theta_s))
    return eye + a * m + b * (m @ m)


def angle_axis_rotate(r: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate (..., 3) vectors by axis-angle r without forming R."""
    theta = _safe_norm(r)[..., None]
    rxv = jnp.cross(r, v)
    rxrxv = jnp.cross(r, rxv)
    small = theta < _EPS
    theta_s = jnp.where(small, 1.0, theta)
    a = jnp.where(small, 1.0, jnp.sin(theta_s) / theta_s)
    b = jnp.where(small, 0.5, (1.0 - jnp.cos(theta_s)) / (theta_s * theta_s))
    return v + a * rxv + b * rxrxv


def inverse_rodrigues_formula(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3), with the
    reference's three-regime numerical handling (`rotations.h:61-117`):
    near-identity, near-pi, and the generic case."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    d = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    dR = unskew(R - jnp.swapaxes(R, -1, -2))
    nDr = _safe_norm(dR)
    theta = jnp.arccos(d)

    # generic branch
    denom = 2.0 * jnp.sqrt(jnp.maximum(1.0 - d * d, _EPS ** 2))
    omega_gen = (theta / denom)[..., None] * dR

    # near-identity branch (d > 0.999)
    omega_id = 0.5 * dR

    # near-pi branch (antisymmetric part vanishes but d is not ~1)
    S = R + jnp.swapaxes(R, -1, -2) + (1.0 - trace)[..., None, None] \
        * jnp.eye(3)
    denom3 = jnp.maximum(3.0 - trace, _EPS)[..., None]
    diag = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], -1)
    n = jnp.sqrt(jnp.maximum(diag / denom3, 0.0))
    # fix signs from the dominant row of S (the reference picks the largest
    # component and derives the others from the off-diagonals)
    k = jnp.argmax(n, axis=-1)
    rows = jnp.take_along_axis(
        S, k[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    nk = jnp.take_along_axis(n, k[..., None], -1)
    n_signed = rows / denom3 / jnp.maximum(nk, _EPS)
    n_signed = jnp.where(
        jax.nn.one_hot(k, 3, dtype=bool), n, n_signed)
    omega_pi = theta[..., None] * n_signed

    out = jnp.where((d > 0.999)[..., None], omega_id,
                    jnp.where((nDr < 1e-3)[..., None], omega_pi, omega_gen))
    return out


def diff_rodrigues_lie_algebra(r: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian of SO(3) at r (`diffRodriguezLieAlgebra`,
    `rotations.h:127`).  Kept for API parity; prefer jax.jacfwd."""
    theta = _safe_norm(r)[..., None, None]
    m = skew(r)
    eye = jnp.broadcast_to(jnp.eye(3), m.shape)
    small = theta < _EPS
    theta_s = jnp.where(small, 1.0, theta)
    a = jnp.where(small, 0.5, (1.0 - jnp.cos(theta_s)) / (theta_s * theta_s))
    b = jnp.where(small, 1.0 / 6.0,
                  (theta_s - jnp.sin(theta_s)) / (theta_s ** 3))
    return eye - a * m + b * (m @ m)


def axis_angle_to_quaternion(r: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle -> unit quaternion [w, x, y, z] (`rotations.h:208`)."""
    theta = _safe_norm(r)[..., None]
    small = theta < _EPS
    theta_s = jnp.where(small, 1.0, theta)
    half = 0.5 * theta_s
    s = jnp.where(small, 0.5, jnp.sin(half) / theta_s)
    w = jnp.where(small[..., 0], 1.0, jnp.cos(half[..., 0]))
    xyz = s * r
    q = jnp.concatenate([w[..., None], xyz], -1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [w, x, y, z] -> axis-angle (`rotations.h:271`)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w = q[..., 0]
    sign = jnp.where(w < 0, -1.0, 1.0)  # take the short rotation
    q = q * sign[..., None]
    w = q[..., 0]
    v = q[..., 1:]
    nv = _safe_norm(v)
    theta = 2.0 * jnp.arctan2(nv, w)
    small = nv < _EPS
    scale = jnp.where(small, 2.0, theta / jnp.where(small, 1.0, nv))
    return scale[..., None] * v


def quaternion_product(qa: jnp.ndarray, qb: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, [w, x, y, z] convention."""
    w1, x1, y1, z1 = qa[..., 0], qa[..., 1], qa[..., 2], qa[..., 3]
    w2, x2, y2, z2 = qb[..., 0], qb[..., 1], qb[..., 2], qb[..., 3]
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], -1)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RigidBodyTransform:
    """x -> R(r) x + t with r the axis-angle (`RigidBodyTransform`,
    `rotations.h:279`)."""

    r: jnp.ndarray
    t: jnp.ndarray

    @classmethod
    def identity(cls) -> "RigidBodyTransform":
        return cls(jnp.zeros(3), jnp.zeros(3))

    @classmethod
    def from_affine(cls, a: AffineTransform) -> "RigidBodyTransform":
        return cls(inverse_rodrigues_formula(a.R), a.t)

    def to_affine(self) -> AffineTransform:
        return AffineTransform(rodrigues_formula(self.r), self.t)

    def apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        return angle_axis_rotate(self.r, pts) + self.t

    def __mul__(self, other: "RigidBodyTransform") -> "RigidBodyTransform":
        """(self * other)(x) == self(other(x)); composition happens on the
        manifold via quaternions (`rotations.h:330-356`)."""
        q = quaternion_product(axis_angle_to_quaternion(self.r),
                               axis_angle_to_quaternion(other.r))
        return RigidBodyTransform(quaternion_to_axis_angle(q),
                                  self.apply(other.t))

    def inverse(self) -> "RigidBodyTransform":
        return RigidBodyTransform(-self.r,
                                  -angle_axis_rotate(-self.r, self.t))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ShapePreservingTransform:
    """7-DoF similarity x -> s R(r) x + t (`ShapePreservingTransform`,
    `rotations.h:439`)."""

    r: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray

    @classmethod
    def identity(cls) -> "ShapePreservingTransform":
        return cls(jnp.zeros(3), jnp.zeros(3), jnp.ones(()))

    def apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        return self.s * angle_axis_rotate(self.r, pts) + self.t

    def to_affine(self) -> AffineTransform:
        return AffineTransform(self.s * rodrigues_formula(self.r), self.t)

    def __mul__(self, other):
        q = quaternion_product(axis_angle_to_quaternion(self.r),
                               axis_angle_to_quaternion(other.r))
        return ShapePreservingTransform(quaternion_to_axis_angle(q),
                                        self.apply(other.t),
                                        self.s * other.s)

    def inverse(self) -> "ShapePreservingTransform":
        inv_s = 1.0 / self.s
        return ShapePreservingTransform(
            -self.r, -inv_s * angle_axis_rotate(-self.r, self.t), inv_s)


def interpolate_rigid_body_transform_on_manifold(
        w1, t1: RigidBodyTransform, w2, t2: RigidBodyTransform
        ) -> RigidBodyTransform:
    """Weighted interpolation on SE(3): scale the delta transform by
    w2 / (w1 + w2) in the tangent space and recompose
    (`interpolateRigidBodyTransformOnManifold`, `rotations.h:424-437`)."""
    delta = t2 * t1.inverse()
    w = w2 / (w1 + w2)
    scaled = RigidBodyTransform(w * delta.r, w * delta.t)
    return scaled * t1


def euler_radxyz_to_rotation(rx, ry, rz) -> jnp.ndarray:
    """R = Rz @ Ry @ Rx (XYZ EXTRINSIC, equivalently ZYX intrinsic;
    `eulerRadXYZToRotation`,
    `rotations.h:539`)."""
    ex = jnp.stack([jnp.asarray(rx), jnp.zeros_like(jnp.asarray(rx)),
                    jnp.zeros_like(jnp.asarray(rx))], -1)
    ey = jnp.stack([jnp.zeros_like(jnp.asarray(ry)), jnp.asarray(ry),
                    jnp.zeros_like(jnp.asarray(ry))], -1)
    ez = jnp.stack([jnp.zeros_like(jnp.asarray(rz)),
                    jnp.zeros_like(jnp.asarray(rz)), jnp.asarray(rz)], -1)
    return rodrigues_formula(ez) @ rodrigues_formula(ey) @ rodrigues_formula(ex)


def euler_degxyz_to_rotation(rx, ry, rz) -> jnp.ndarray:
    d2r = jnp.pi / 180.0
    return euler_radxyz_to_rotation(rx * d2r, ry * d2r, rz * d2r)
