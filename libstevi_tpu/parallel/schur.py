"""Distributed Gauss-Newton with Schur-complement reduction.

No reference counterpart (the reference's alignment solvers are single-host,
`pointcloudalignment.h:739`, `genericraysalignement.h:71`); this is the
multi-chip scale-out named in SURVEY.md §2.8: observations are sharded over
a mesh axis, each shard accumulates its partial normal equations (J^T J,
J^T r), one `psum` reduces them over ICI, and every shard solves the same
reduced system — bitwise identical across shards, communication is
O(params^2) per iteration regardless of observation count.

For structure+pose problems, `schur_complement_solve` eliminates the
(block-diagonal) structure block first, so the distributed solve only
reduces the pose-block system.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def distributed_gauss_newton(residual_fn: Callable, x0: jnp.ndarray,
                             data, axis_name: str, iters: int = 25,
                             damping: float = 1e-8) -> jnp.ndarray:
    """Run inside shard_map: `data` leaves are sharded over `axis_name`;
    ``residual_fn(x, data) -> (m_local,)`` local residuals.  Returns the
    converged parameters (replicated)."""
    n = x0.shape[0]

    def step(x, _):
        r = residual_fn(x, data)
        J = jax.jacfwd(residual_fn)(x, data)
        JtJ = jax.lax.psum(J.T @ J, axis_name)
        Jtr = jax.lax.psum(J.T @ r, axis_name)
        delta = jnp.linalg.solve(JtJ + damping * jnp.eye(n), Jtr)
        return x - delta, None

    x, _ = jax.lax.scan(step, x0, None, length=iters)
    return x


def schur_complement_solve(JtJ_pp, JtJ_ps, JtJ_ss_blocks, b_p, b_s_blocks,
                           damping: float = 1e-8):
    """Solve the two-block normal system

        [ JtJ_pp   JtJ_ps ] [dp]   [b_p]
        [ JtJ_ps^T  JtJ_ss] [ds] = [b_s]

    where JtJ_ss is block diagonal with (k, s, s) blocks (one per structure
    element, e.g. 3x3 point blocks): eliminate ds, solve the reduced pose
    system, back-substitute.  JtJ_ps is (P, k, s) (pose-to-structure
    coupling per element), b_s_blocks (k, s).
    """
    P = JtJ_pp.shape[0]
    k, s, _ = JtJ_ss_blocks.shape
    eye = jnp.eye(s) * damping
    inv_ss = jax.vmap(lambda B: jnp.linalg.inv(B + eye))(JtJ_ss_blocks)

    # S = JtJ_pp - sum_k E_k C_k^-1 E_k^T ; rhs = b_p - sum_k E_k C_k^-1 b_k
    E_Cinv = jnp.einsum("pks,kst->pkt", JtJ_ps, inv_ss)      # (P, k, s)
    S = JtJ_pp - jnp.einsum("pkt,qkt->pq", E_Cinv, JtJ_ps)
    rhs = b_p - jnp.einsum("pkt,kt->p", E_Cinv, b_s_blocks)
    dp = jnp.linalg.solve(S + damping * jnp.eye(P), rhs)

    ds = jnp.einsum("kst,kt->ks", inv_ss,
                    b_s_blocks - jnp.einsum("pks,p->ks", JtJ_ps, dp))
    return dp, ds


def distributed_multiview_alignment(residual_fn: Callable, x0: jnp.ndarray,
                                    data, mesh, axis_name: str = "batch",
                                    iters: int = 25, damping: float = 1e-8):
    """Convenience wrapper: jit + shard_map a distributed GN over `mesh`,
    observations sharded on their leading axis."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def local(x0_l, data_l):
        return distributed_gauss_newton(residual_fn, x0_l, data_l,
                                        axis_name, iters, damping)

    data_spec = jax.tree_util.tree_map(lambda _: P(axis_name), data)
    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=(P(), data_spec), out_specs=P(),
        check_vma=False))(x0, data)
