"""Pallas TPU kernels for PatchMatch propagation sweeps.

The XLA `lax.scan` sweeps of `patchmatch.py` pay per-step dispatch for 640+
tiny steps; here one grid-sequential kernel streams the precomputed cost
volume once per sweep and keeps the propagating line in VMEM scratch.

Layout: disparity on SUBLANES, pixels on lanes ((L, Dp, Sp) volumes — the
same layout as `sgm_pallas_dhw`): a candidate evaluation is a one-hot
sublane select-and-reduce, and blocks stream ~2.5x faster than the
(L, Sp, Dp) lane-layout (measured 0.38 vs 0.95 ms per full-volume pass at
480x640 D=120).

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


def _eval(cvt, dd, v):
    """cost of candidate disparity field v ((1, Sp) int32) on a (Dp, Sp)
    tile: one-hot sublane select-and-reduce (the gather-free form — TPU
    gathers along sublanes are ~12x slower)."""
    return jnp.sum(jnp.where(dd == v, cvt, 0.0), axis=0, keepdims=True)


def _sweep_kernel(cv_ref, disp_in, cost_in, disp_out, cost_out, carry_ref,
                  *, CC, VC, Dp, Sp, D, L, lower, reverse):
    """One propagation sweep along the leading (scan) axis of an
    (L, Dp, Sp) cost volume: line l's pixels test the already-updated
    disparity of line l-1 (l+1 on reverse), all Sp lanes in parallel.

    The naive formulation chains (eval -> compare -> select) per line,
    which is LATENCY-bound.  Key observation: within a chunk of VC lines,
    the value that can propagate into line l is either the chunk's
    carry-in or one of the chunk's own pre-sweep disparities disp_old[m],
    m < l (a propagated value survives only through unbroken acceptance).
    So ALL candidate evaluations sel[l][m] are computed up front —
    independent, fully pipelined reductions — and the sequential part
    collapses to cheap per-line (1, Sp) selects resolving where each
    pixel's acceptance chain last broke.  Identical results to the naive
    recurrence.  ``VC`` (virtual chunk, <= CC) trades redundant
    evaluations (~(VC+3)/2 per line) against chain latency while block
    shapes keep the 8-sublane tiling minimum (CC = 8)."""
    h = pl.program_id(0)
    n = pl.num_programs(0)
    b = (n - 1 - h) if reverse else h

    dd = lower + jax.lax.broadcasted_iota(jnp.int32, (Dp, Sp), 0)
    carry = carry_ref[:]                               # (1, Sp) int32

    order = (range(CC - 1, -1, -1) if reverse else range(CC))
    order = list(order)

    for sub in range(CC // VC):
        chunk = order[sub * VC:(sub + 1) * VC]
        # pre-sweep values and candidate evaluations (all independent)
        vals = {cc: disp_in[cc].reshape(1, Sp) for cc in chunk}
        costs0 = {cc: cost_in[cc].reshape(1, Sp) for cc in chunk}
        cand_vals = {}                                 # source -> (1, Sp)
        sels = {}                                      # (line, source)
        for li, cc in enumerate(chunk):
            cvt = cv_ref[cc]
            srcs = [-1] + chunk[:li]                   # -1 == carry-in
            for m in srcs:
                v = carry if m == -1 else vals[m]
                sels[(cc, m)] = _eval(cvt, dd, v)
                cand_vals[m] = v

        # resolve the acceptance chains with per-line selects
        src = jnp.full((1, Sp), -1, jnp.int32)
        for li, cc in enumerate(chunk):
            l = b * CC + cc
            ok = (l >= 1) if not reverse else (l <= L - 2)
            sel = sels[(cc, -1)]
            v = cand_vals[-1]
            for m in chunk[:li]:
                pick = src == m
                sel = jnp.where(pick, sels[(cc, m)], sel)
                v = jnp.where(pick, cand_vals[m], v)
            in_range = (v >= lower) & (v < lower + D)
            acc = ok & in_range & jnp.isfinite(sel) & (sel <= costs0[cc])
            disp_out[cc] = jnp.where(acc, v, vals[cc]).reshape(Sp)
            cost_out[cc] = jnp.where(acc, sel, costs0[cc]).reshape(Sp)
            src = jnp.where(acc, src, cc)

        # carry into the next chunk: the last processed line's updated
        # disparity (resolved from where each pixel's chain broke)
        last = chunk[-1]
        carry_out = cand_vals[-1]
        for m in chunk[:-1]:
            carry_out = jnp.where(src == m, cand_vals[m], carry_out)
        carry_out = jnp.where(src == last, vals[last], carry_out)
        carry = carry_out
    carry_ref[:] = carry


def _probe_kernel(cv_ref, cand_ref, disp_in, cost_in, disp_out, cost_out,
                  *, RC, K, Dp, Sp, D, lower):
    """Evaluate K candidate fields against the current solution in ONE
    volume read, accepting improvements sequentially (ties accept;
    non-finite rejects) — the random-search / init step.  Sequential
    acceptance over candidates matches `patchMatchSearch`'s probe loop
    (`patchmatch.h:234-366`) up to candidate generation (see caller)."""
    dd = lower + jax.lax.broadcasted_iota(jnp.int32, (Dp, Sp), 0)
    for rr in range(RC):
        cvt = cv_ref[rr]
        cur_d = disp_in[rr].reshape(1, Sp)
        cur_c = cost_in[rr].reshape(1, Sp)
        for k in range(K):
            cand = cand_ref[rr, k].reshape(1, Sp)
            sel = _eval(cvt, dd, cand)
            # out-of-search-range candidates MISS every sublane (sel = 0)
            # and must be rejected explicitly, like the reference's
            # costValue nullopt (`patchmatch.h:199-203`)
            in_range = (cand >= lower) & (cand < lower + D)
            acc = in_range & jnp.isfinite(sel) & (sel <= cur_c)
            cur_d = jnp.where(acc, cand, cur_d)
            cur_c = jnp.where(acc, sel, cur_c)
        disp_out[rr] = cur_d.reshape(Sp)
        cost_out[rr] = cur_c.reshape(Sp)


def probe(cv_p: jnp.ndarray, cand: jnp.ndarray, disp: jnp.ndarray,
          cost: jnp.ndarray, lower: int, D: int, rc: int = 8,
          interpret: bool = False):
    """Accept-if-better update of (disp, cost) with candidate field(s)
    `cand` — (Lp, Sp) for one field or (Lp, K, Sp) for K fields evaluated
    in a single volume read — over a padded cost-oriented (Lp, Dp, Sp)
    volume.  (No input_output_aliases: aliasing state in/out measures 2x
    slower by serializing Mosaic block prefetch, see sgm_pallas_dhw.)"""
    Lp, Dp, Sp = cv_p.shape
    if Lp % rc:
        raise ValueError(f"the row chunk rc ({rc}) must divide Lp ({Lp}) "
                         "— trailing lines would be silently dropped")
    if cand.ndim == 2:
        cand = cand[:, None, :]
    K = cand.shape[1]
    vol_spec = pl.BlockSpec((rc, Dp, Sp), lambda h: (h, 0, 0),
                            memory_space=pltpu.VMEM)
    cand_spec = pl.BlockSpec((rc, K, Sp), lambda h: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    map_spec = pl.BlockSpec((rc, Sp), lambda h: (h, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_probe_kernel, RC=rc, K=K, Dp=Dp, Sp=Sp,
                               D=D, lower=lower)
    return pl.pallas_call(
        kernel, grid=(Lp // rc,),
        in_specs=[vol_spec, cand_spec, map_spec, map_spec],
        out_specs=[map_spec, map_spec],
        out_shape=[jax.ShapeDtypeStruct((Lp, Sp), jnp.int32),
                   jax.ShapeDtypeStruct((Lp, Sp), jnp.float32)],
        interpret=interpret)(cv_p, cand, disp, cost)


def sweep(cv_p: jnp.ndarray, disp: jnp.ndarray, cost: jnp.ndarray,
          lower: int, D: int, L: int, reverse: bool, cc: int = 8,
          vc: int = 4, interpret: bool = False):
    """One full sweep over a (Lp, Dp, Sp) padded cost-oriented volume with
    (Lp, Sp) disparity/cost state; returns updated (disp, cost)."""
    Lp, Dp, Sp = cv_p.shape
    if Lp % cc or cc % vc:
        raise ValueError(f"cc ({cc}) must divide Lp ({Lp}) and vc ({vc}) "
                         "must divide cc — uncovered lines would keep "
                         "uninitialized output rows")
    n = Lp // cc
    if reverse:
        vol_map = lambda h: (n - 1 - h, 0, 0)
        map_map = lambda h: (n - 1 - h, 0)
    else:
        vol_map = lambda h: (h, 0, 0)
        map_map = lambda h: (h, 0)
    vol_spec = pl.BlockSpec((cc, Dp, Sp), vol_map, memory_space=pltpu.VMEM)
    map_spec = pl.BlockSpec((cc, Sp), map_map, memory_space=pltpu.VMEM)
    kernel = functools.partial(_sweep_kernel, CC=cc, VC=vc, Dp=Dp, Sp=Sp,
                               D=D, L=L, lower=lower, reverse=reverse)
    return pl.pallas_call(
        kernel, grid=(n,),
        in_specs=[vol_spec, map_spec, map_spec],
        out_specs=[map_spec, map_spec],
        out_shape=[jax.ShapeDtypeStruct((Lp, Sp), jnp.int32),
                   jax.ShapeDtypeStruct((Lp, Sp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((1, Sp), jnp.int32)],
        interpret=interpret)(cv_p, disp, cost)
