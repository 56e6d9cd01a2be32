"""Gauss-Newton solver framework.

Reference parity: `optimization/gaussnewtownproblem.h:84-208` — the abstract
`GaussNewtownProblem` (user supplies residuals + Jacobian, QR-solved steps,
optional robust kernel, solution history, convergence status).

TPU design: the user supplies only a residual function; the Jacobian comes
from `jax.jacfwd` (replacing the virtual `computeJacobian`), the iteration is
a `lax.scan` recording the solution history, and damping keeps the normal
equations well-posed.  Everything jits and vmaps (e.g. batched RANSAC
refits).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from .huber import huber_weight


class ConvergenceType(enum.Enum):
    ERROR = 0
    CONVERGED = 1
    MAX_STEPS_REACHED = 2


@dataclass
class GNResult:
    x: jnp.ndarray
    history: jnp.ndarray          # (iters+1, n) solution history
    residual_norm: jnp.ndarray
    converged: jnp.ndarray        # bool: step norm fell below tolerance
    status: ConvergenceType | None = None


class GaussNewton:
    """Gauss-Newton with optional Huber robustification.

    ``residual_fn(x, *args) -> (m,)``; `solve` runs a fixed number of damped
    GN steps (jit-stable) and reports convergence by final step size.
    """

    def __init__(self, residual_fn: Callable, iters: int = 25,
                 damping: float = 1e-8, huber_delta: float | None = None,
                 tol: float = 1e-5):
        self.residual_fn = residual_fn
        self.iters = iters
        self.damping = damping
        self.huber_delta = huber_delta
        self.tol = tol

    def solve(self, x0: jnp.ndarray, *args) -> GNResult:
        n = x0.shape[0]

        def step(x, _):
            r = self.residual_fn(x, *args)
            J = jax.jacfwd(self.residual_fn)(x, *args)
            if self.huber_delta is not None:
                w = huber_weight(r, self.huber_delta)
                Jw = J * w[:, None]
                rhs = Jw.T @ r
                JtJ = Jw.T @ J
            else:
                rhs = J.T @ r
                JtJ = J.T @ J
            delta = jnp.linalg.solve(JtJ + self.damping * jnp.eye(n), rhs)
            x_new = x - delta
            return x_new, (x_new, jnp.linalg.norm(delta))

        x_final, (hist, steps) = jax.lax.scan(step, x0, None,
                                              length=self.iters)
        history = jnp.concatenate([x0[None], hist], 0)
        r = self.residual_fn(x_final, *args)
        conv = steps[-1] < self.tol
        # status derives from the converged flag host-side when the
        # result is concrete (`gaussnewtownproblem.h:121` ConvergenceType)
        try:
            status = (ConvergenceType.CONVERGED if bool(conv)
                      else ConvergenceType.MAX_STEPS_REACHED)
        except jax.errors.TracerBoolConversionError:
            status = None               # inside jit: use `converged`
        return GNResult(x=x_final, history=history,
                        residual_norm=jnp.linalg.norm(r),
                        converged=conv, status=status)
