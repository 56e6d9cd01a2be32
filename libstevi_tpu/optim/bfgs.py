"""BFGS quasi-Newton minimizer.

Reference parity: `optimization/bfgs.h` (274 LoC hand-rolled BFGS).  Here a
compact jit-friendly BFGS with backtracking line search; gradients come from
autodiff instead of user-supplied closures.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass
class BfgsResult:
    x: jnp.ndarray
    f: jnp.ndarray
    converged: jnp.ndarray
    n_iter: jnp.ndarray


def bfgs_minimize(fun, x0: jnp.ndarray, iters: int = 100, tol: float = 1e-6,
                  ls_steps: int = 20) -> BfgsResult:
    """Minimize ``fun(x)`` from x0 with BFGS + backtracking Armijo search."""
    n = x0.shape[0]
    grad = jax.grad(fun)

    def line_search(x, p, f0, g0):
        slope = jnp.dot(g0, p)

        def body(carry, _):
            t, done = carry
            f_t = fun(x + t * p)
            ok = f_t <= f0 + 1e-4 * t * slope
            t_next = jnp.where(done | ok, t, t * 0.5)
            return (t_next, done | ok), None

        (t, ok), _ = jax.lax.scan(body, (jnp.float32(1.0), False),
                                  None, length=ls_steps)
        return jnp.where(ok, t, 0.0)

    def step(carry, _):
        x, H, f, g, done = carry
        p = -(H @ g)
        t = line_search(x, p, f, g)
        s = t * p
        x_new = x + s
        g_new = grad(x_new)
        y = g_new - g
        sy = jnp.dot(s, y)
        safe = sy > 1e-12
        rho = jnp.where(safe, 1.0 / jnp.where(safe, sy, 1.0), 0.0)
        I = jnp.eye(n)
        V = I - rho * jnp.outer(s, y)
        H_new = jnp.where(safe, V @ H @ V.T + rho * jnp.outer(s, s), H)
        f_new = fun(x_new)
        conv = jnp.linalg.norm(g_new) < tol
        keep = done | conv
        return (jnp.where(done, x, x_new), jnp.where(done, H, H_new),
                jnp.where(done, f, f_new), jnp.where(done, g, g_new),
                keep), keep

    g0 = grad(x0)
    init = (x0, jnp.eye(n), fun(x0), g0, jnp.linalg.norm(g0) < tol)
    (x, H, f, g, done), hist = jax.lax.scan(step, init, None, length=iters)
    return BfgsResult(x=x, f=f, converged=done,
                      n_iter=jnp.argmax(hist) + 1 if hist.size else iters)
