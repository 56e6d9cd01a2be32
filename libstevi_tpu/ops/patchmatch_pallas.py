"""Pallas TPU kernels for PatchMatch propagation sweeps.

The XLA `lax.scan` sweeps of `patchmatch.py` pay per-step dispatch for 640+
tiny steps; here one grid-sequential kernel streams the precomputed cost
volume once per sweep and keeps the propagating line in VMEM scratch.

Exactness: the reference's on-demand cost volume memoizes
cost(i, j, d) = compare(source[i, j], target[i, j + d])
(`on_demand_cost_volume.h:105-181`), which IS the dense cost volume — so
sweeping over a precomputed volume is the cached variant's semantics with
bit-identical values.  Out-of-image / out-of-search-range candidates carry
+inf (the reference's `costValue` nullopt -> reject, `patchmatch.h:199-203`)
and are rejected by an isfinite guard BEFORE the tie-accepting comparison.
Everything runs in cost orientation (score volumes are negated by the
caller); ties accept, matching `patchMatchTestCost` (`patchmatch.h:210`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")


def _round_up(x, m):
    return (x + m - 1) // m * m


def _sweep_kernel(cv_ref, disp_in, cost_in, disp_out, cost_out, carry_ref,
                  *, CC, Sp, Dp, D, L, lower, reverse):
    """One propagation sweep along the leading (scan) axis of a
    (L, Sp, Dp) cost volume: line l's pixels test the already-updated
    disparity of line l-1 (l+1 on reverse), all Sp lanes in parallel.

    The naive formulation chains (gather -> lane-reduce -> compare) per
    line, which is LATENCY-bound (~4 us/line).  Key observation: within a
    block of CC lines, the value that can propagate into line l is either
    the block's carry-in or one of the block's own pre-sweep disparities
    disp_old[m], m < l (a propagated value survives only through unbroken
    acceptance).  So ALL candidate evaluations sel[l][m] = CV[l, s, v_m]
    are computed up front — independent, fully pipelined reductions — and
    the sequential part collapses to cheap per-line (Sp, 1) selects
    resolving where each pixel's acceptance chain last broke.  Identical
    results to the naive recurrence."""
    h = pl.program_id(0)
    n = pl.num_programs(0)
    b = (n - 1 - h) if reverse else h

    dd = lower + jax.lax.broadcasted_iota(jnp.int32, (Sp, Dp), 1)
    carry = carry_ref[:]                               # (Sp, 1) int32

    order = (range(CC - 1, -1, -1) if reverse else range(CC))
    order = list(order)

    # pre-sweep values and candidate evaluations (all independent)
    vals = [disp_in[cc].reshape(Sp, 1) for cc in range(CC)]
    costs0 = [cost_in[cc].reshape(Sp, 1) for cc in range(CC)]
    cand_vals = {}                                     # source -> (Sp, 1)
    sels = {}                                          # (line, source)
    for li, cc in enumerate(order):
        cvt = cv_ref[cc]
        srcs = [-1] + order[:li]                       # -1 == carry-in
        for m in srcs:
            v = carry if m == -1 else vals[m]
            sels[(cc, m)] = jnp.sum(jnp.where(dd == v, cvt, 0.0),
                                    axis=-1, keepdims=True)
            cand_vals[m] = v

    # resolve the acceptance chains with per-line selects
    src = jnp.full((Sp, 1), -1, jnp.int32)
    for li, cc in enumerate(order):
        l = b * CC + cc
        ok = (l >= 1) if not reverse else (l <= L - 2)
        sel = sels[(cc, -1)]
        v = cand_vals[-1]
        for m in order[:li]:
            pick = src == m
            sel = jnp.where(pick, sels[(cc, m)], sel)
            v = jnp.where(pick, cand_vals[m], v)
        in_range = (v >= lower) & (v < lower + D)
        acc = ok & in_range & jnp.isfinite(sel) & (sel <= costs0[cc])
        disp_out[cc] = jnp.where(acc, v, vals[cc]).reshape(Sp)
        cost_out[cc] = jnp.where(acc, sel, costs0[cc]).reshape(Sp)
        src = jnp.where(acc, src, cc)

    # carry out: the last processed line's updated disparity
    last = order[-1]
    carry_out = cand_vals[-1]
    for m in order[:-1]:
        carry_out = jnp.where(src == m, cand_vals[m], carry_out)
    carry_out = jnp.where(src == last, vals[last], carry_out)
    carry_ref[:] = carry_out


def _probe_kernel(cv_ref, cand_ref, disp_in, cost_in, disp_out, cost_out,
                  *, RC, Sp, Dp, D, lower):
    """Evaluate one candidate field against the current solution and accept
    improvements (ties accept; non-finite rejects) — the random-search /
    init step fused into one volume read."""
    dd = lower + jax.lax.broadcasted_iota(jnp.int32, (Sp, Dp), 1)
    for rr in range(RC):
        cvt = cv_ref[rr]
        cand = cand_ref[rr].reshape(Sp, 1)
        cur_d = disp_in[rr].reshape(Sp, 1)
        cur_c = cost_in[rr].reshape(Sp, 1)
        sel = jnp.sum(jnp.where(dd == cand, cvt, 0.0), axis=-1,
                      keepdims=True)
        # out-of-search-range candidates MISS every lane (sel = 0.0) and
        # must be rejected explicitly, like the reference's costValue
        # nullopt (`patchmatch.h:199-203`)
        in_range = (cand >= lower) & (cand < lower + D)
        acc = in_range & jnp.isfinite(sel) & (sel <= cur_c)
        disp_out[rr] = jnp.where(acc, cand, cur_d).reshape(Sp)
        cost_out[rr] = jnp.where(acc, sel, cur_c).reshape(Sp)


def probe(cv_p: jnp.ndarray, cand: jnp.ndarray, disp: jnp.ndarray,
          cost: jnp.ndarray, lower: int, D: int, rc: int = 8,
          interpret: bool = False):
    """Accept-if-better update of (disp, cost) with candidate field `cand`
    over a padded cost-oriented (Lp, Sp, Dp) volume."""
    Lp, Sp, Dp = cv_p.shape
    vol_spec = pl.BlockSpec((rc, Sp, Dp), lambda h: (h, 0, 0),
                            memory_space=pltpu.VMEM)
    map_spec = pl.BlockSpec((rc, Sp), lambda h: (h, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_probe_kernel, RC=rc, Sp=Sp, Dp=Dp, D=D,
                               lower=lower)
    return pl.pallas_call(
        kernel, grid=(Lp // rc,),
        in_specs=[vol_spec, map_spec, map_spec, map_spec],
        out_specs=[map_spec, map_spec],
        out_shape=[jax.ShapeDtypeStruct((Lp, Sp), jnp.int32),
                   jax.ShapeDtypeStruct((Lp, Sp), jnp.float32)],
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret)(cv_p, cand, disp, cost)


def sweep(cv_p: jnp.ndarray, disp: jnp.ndarray, cost: jnp.ndarray,
          lower: int, D: int, L: int, reverse: bool, cc: int = 8,
          interpret: bool = False):
    """One full sweep over a (Lp, Sp, Dp) padded cost-oriented volume with
    (Lp, Sp) disparity/cost state; returns updated (disp, cost)."""
    Lp, Sp, Dp = cv_p.shape
    n = Lp // cc
    if reverse:
        vol_map = lambda h: (n - 1 - h, 0, 0)
        map_map = lambda h: (n - 1 - h, 0)
    else:
        vol_map = lambda h: (h, 0, 0)
        map_map = lambda h: (h, 0)
    vol_spec = pl.BlockSpec((cc, Sp, Dp), vol_map, memory_space=pltpu.VMEM)
    map_spec = pl.BlockSpec((cc, Sp), map_map, memory_space=pltpu.VMEM)
    kernel = functools.partial(_sweep_kernel, CC=cc, Sp=Sp, Dp=Dp, D=D,
                               L=L, lower=lower, reverse=reverse)
    return pl.pallas_call(
        kernel, grid=(n,),
        in_specs=[vol_spec, map_spec, map_spec],
        out_specs=[map_spec, map_spec],
        out_shape=[jax.ShapeDtypeStruct((Lp, Sp), jnp.int32),
                   jax.ShapeDtypeStruct((Lp, Sp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((Sp, 1), jnp.int32)],
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret)(cv_p, disp, cost)
