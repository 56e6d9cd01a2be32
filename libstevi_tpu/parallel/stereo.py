"""Distributed dense-stereo pipelines over a device mesh.

No reference counterpart (SURVEY.md §2.8): these are the multi-chip
re-expression of the single-host OpenMP pipelines.  Three sharding modes,
freely composable on the ``(batch, tile, dsh)`` mesh of `mesh.py`:

  * batch DP  — pairs sharded over ``batch``; zero communication.
  * row tiles — images sharded over ``tile``; halo exchange of the window
    margin rows for the cost volume, carry relay for vertical SGM.
  * D-shard   — the disparity axis sharded over ``dsh``; WTA finishes with a
    cross-shard argmin reduction that preserves the reference's
    ties-toward-last-global-index rule.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.types import MatchingFunction, MATCH_TRAITS, ExtractionStrategy, \
    disp_dtype
from ..core.types import DispDirection
from ..ops.cost_volume import unfold_based_cost_volume
from .halo import halo_exchange_rows
from .sgm_dist import distributed_sgm


def _local_cv_with_halo(func, img_l, img_r, h_radius, v_radius, disp_width,
                        axis_name):
    """Cost volume rows for this shard, exact at shard seams via halo rows.

    The box/unfold backends only need v_radius rows of context; at global
    image borders the zero halo reproduces the unfold zero-fill."""
    halo = v_radius   # the CV window needs exactly v_radius rows of context
    l_ext = halo_exchange_rows(img_l, halo, halo, axis_name)
    r_ext = halo_exchange_rows(img_r, halo, halo, axis_name)
    cv_ext = unfold_based_cost_volume(func, l_ext, r_ext, h_radius, v_radius,
                                      disp_width)
    H_loc = img_l.shape[0]
    return jax.lax.dynamic_slice_in_dim(cv_ext, halo, H_loc, axis=0)


def _wta_last_tie(cv, strategy):
    """Ties-toward-last WTA — one definition for single-chip and
    distributed paths (ops.cost_volume.extract_selected_index)."""
    from ..ops.cost_volume import extract_selected_index
    return extract_selected_index(cv, strategy).astype(disp_dtype)


def dshard_wta(cv_local: jnp.ndarray, strategy: ExtractionStrategy,
               axis_name: str = "dsh") -> jnp.ndarray:
    """WTA over a D-sharded cost volume: local WTA then a cross-shard
    reduction keeping the reference's ties-toward-last-global-index rule.
    cv_local: (H, W, D_loc); returns the global selected index (H, W)."""
    n = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    D_loc = cv_local.shape[-1]
    local_idx = _wta_last_tie(cv_local, strategy)
    local_val = jnp.take_along_axis(cv_local, local_idx[..., None].astype(
        jnp.int32), -1)[..., 0]
    global_idx = local_idx + me * D_loc

    vals = jax.lax.all_gather(local_val, axis_name)     # (n, H, W)
    idxs = jax.lax.all_gather(global_idx, axis_name)
    # reduce over shards, later shards win ties (global index order == shard
    # order because the D axis is sharded contiguously)
    if strategy is ExtractionStrategy.COST:
        shard_sel = (vals.shape[0] - 1
                     - jnp.argmin(jnp.flip(vals, 0), 0))
    else:
        shard_sel = (vals.shape[0] - 1
                     - jnp.argmax(jnp.flip(vals, 0), 0))
    return jnp.take_along_axis(idxs, shard_sel[None], 0)[0]


def distributed_cost_volume_wta(mesh: Mesh, func: MatchingFunction,
                                h_radius: int, v_radius: int, disp_width: int):
    """Build a jittable (img_l, img_r) -> selected disparity index function
    with rows sharded over ``tile``.  Images are (H, W); H must divide the
    tile axis size."""
    strategy = MATCH_TRAITS[func].strategy

    def local_fn(img_l, img_r):
        cv = _local_cv_with_halo(func, img_l, img_r, h_radius, v_radius,
                                 disp_width, "tile")
        return _wta_last_tie(cv, strategy)

    spec = P("tile", None)
    # check_vma=False: the lowering-time platform dispatch in the auto CV
    # backend traces the Pallas branch on every platform, and pallas_call
    # outputs defeat the varying-manual-axes inference (JAX >= 0.9)
    return jax.jit(shard_map(local_fn, mesh=mesh, in_specs=(spec, spec),
                             out_specs=spec, check_vma=False))


def distributed_dense_stereo_step(mesh: Mesh, func: MatchingFunction,
                                  h_radius: int, v_radius: int,
                                  disp_width: int, P1: float, P2: float,
                                  n_directions: int = 4):
    """The full distributed pipeline step: batched stereo pairs sharded over
    ``batch``, rows over ``tile``: box cost volume (halo exchange) ->
    4/8-direction SGM (carry relay; 8 uses the fused Pallas kernels) ->
    WTA -> disparity map.

    Input: (B, H, W) image batches; output (B, H, W) disparities.
    """
    strategy = MATCH_TRAITS[func].strategy
    sign = DispDirection.RIGHT_TO_LEFT.delta_sign

    def pair_fn(img_l, img_r):   # (H_loc, W) row shards of one pair
        cv = _local_cv_with_halo(func, img_l, img_r, h_radius, v_radius,
                                 disp_width, "tile")
        if n_directions >= 8:
            # fused DHW Pallas kernels per shard with vertical + diagonal
            # (+ knight, for 16) carry relay (distributed_sgm_fused_dhw)
            from .sgm_dist import distributed_sgm_fused_dhw
            run = lambda c: distributed_sgm_fused_dhw(
                c, P1, P2, axis_name="tile", n_directions=n_directions)
        else:
            run = lambda c: distributed_sgm(c, P1, P2, axis_name="tile")
        if strategy is ExtractionStrategy.SCORE:
            sgm = -run(-cv)
        else:
            sgm = run(cv)
        idx = _wta_last_tie(sgm, strategy)
        return (sign * idx).astype(disp_dtype)

    def local_fn(imgs_l, imgs_r):  # (B_loc, H_loc, W)
        return jax.vmap(pair_fn)(imgs_l, imgs_r)

    spec = P("batch", "tile", None)
    # check_vma=False: the fused Pallas SGM kernels' outputs defeat the
    # varying-manual-axes inference (same as distributed_full_step)
    inner = jax.jit(shard_map(local_fn, mesh=mesh, in_specs=(spec, spec),
                              out_specs=spec, check_vma=False))
    return _pad_to_mesh(inner, mesh.shape["batch"], mesh.shape["tile"])


def distributed_full_step(mesh: Mesh, func: MatchingFunction, h_radius: int,
                          v_radius: int, disp_width: int, P1: float,
                          P2: float, n_directions: int = 4):
    """The flagship multi-chip step exercising every mesh axis:

      * ``batch`` — stereo pairs sharded (data parallel),
      * ``tile``  — image rows sharded; halo exchange for the cost volume,
        ppermute carry relay for vertical SGM (pipeline parallel analogue),
      * ``dsh``   — each shard builds only its disparity sub-range of the
        cost volume (tensor-parallel analogue), re-assembled with an
        `all_gather` along ``dsh`` before SGM.

    Input (B, H, W) pairs; output (B, H, W) disparity maps.  Works for
    every matching family (the D-shard pre-shift reproduces the
    out-of-range convention per function, see below); B, H and D need
    not divide their mesh axes (see `_pad_to_mesh` / the ceil-division
    D-shard slicing).
    """
    from ..core.search import SearchOffset1
    traits = MATCH_TRAITS[func]
    strategy = traits.strategy
    sign = DispDirection.RIGHT_TO_LEFT.delta_sign
    n_dsh = mesh.shape["dsh"]
    # D need not divide dsh: shards compute ceil(D / n_dsh) disparities
    # each and the surplus is sliced off after the all_gather
    d_loc = -(-disp_width // n_dsh)
    d_total = d_loc * n_dsh

    def pair_fn(img_l, img_r):   # (H_loc, W) shards
        halo = v_radius   # the CV window needs v_radius rows of context
        l_ext = halo_exchange_rows(img_l, halo, halo, "tile")
        r_ext = halo_exchange_rows(img_r, halo, halo, "tile")
        W = img_l.shape[1]
        d0 = jax.lax.axis_index("dsh") * d_loc
        # This shard computes disparities [d0, d0 + d_loc).  All dsh members
        # run the same program, so the base disparity enters as a dynamic
        # pre-shift of the target image (RIGHT_TO_LEFT samples the target at
        # j + d, so target pre-shifted by d0 + local search over [0, d_loc)
        # == global search over [d0, d0 + d_loc)).  The pre-shifted target
        # must keep h_radius columns of real left context (original columns
        # [d0 - h_radius, d0)) or the box sums near column 0 see zeros —
        # so both images are widened by h_radius on the left (zeros for the
        # source == its out-of-image fill) and the extra columns cropped
        # after aggregation.  The mask below reproduces `aggregateCost`'s
        # all-zero-target-VECTOR convention for j + d >= W for every
        # matching family: cost(src, 0) — 0 for the dot family, |src|^2
        # for SSD, popcount(src) for census... (the widened target's zero
        # WINDOWS would normalize to NaN instead).
        ctx = h_radius
        src_w = jnp.pad(r_ext, ((0, 0), (ctx, 0)))
        l_buf = jnp.pad(l_ext, ((0, 0), (ctx, d_total)))
        tgt_w = jax.lax.dynamic_slice_in_dim(
            l_buf, d0, l_ext.shape[1] + ctx, axis=1)
        cv_loc = unfold_based_cost_volume(func, tgt_w, src_w, h_radius,
                                          v_radius,
                                          SearchOffset1(0, d_loc - 1))
        cv_loc = cv_loc[:, ctx:, :]
        H_loc = img_l.shape[0]
        cv_loc = jax.lax.dynamic_slice_in_dim(cv_loc, halo, H_loc, axis=0)
        from ..ops.unfold import unfold
        from ..ops.cost_volume import normalize_feature_volume
        from ..ops.matching import feature_comparison
        src_fv = normalize_feature_volume(
            func, unfold(h_radius, v_radius, r_ext))
        src_fv = jax.lax.dynamic_slice_in_dim(src_fv, halo, H_loc, axis=0)
        oob = feature_comparison(func, src_fv, jnp.zeros_like(src_fv))
        jj = jnp.arange(W, dtype=jnp.int32)[None, :, None]
        dd = jnp.arange(d_loc, dtype=jnp.int32)[None, None, :]
        cv_loc = jnp.where(jj + d0 + dd >= W,
                           oob[..., None].astype(cv_loc.dtype), cv_loc)
        # reassemble the full D axis (all_gather along dsh, ICI
        # all-to-one), dropping the ceil-division surplus disparities
        cv = jnp.moveaxis(jax.lax.all_gather(cv_loc, "dsh"), 0, 2)
        cv = cv.reshape(cv.shape[0], cv.shape[1], d_total)
        cv = cv[..., :disp_width]
        if n_directions >= 8:
            # fused DHW Pallas kernels per shard with vertical + diagonal
            # (+ knight, for 16) carry relay (distributed_sgm_fused_dhw)
            from .sgm_dist import distributed_sgm_fused_dhw
            run = lambda c: distributed_sgm_fused_dhw(
                c, P1, P2, axis_name="tile", n_directions=n_directions)
        else:
            run = lambda c: distributed_sgm(c, P1, P2, axis_name="tile")
        if strategy is ExtractionStrategy.SCORE:
            sgm = -run(-cv)
        else:
            sgm = run(cv)
        idx = _wta_last_tie(sgm, strategy)
        return (sign * idx).astype(disp_dtype)

    def local_fn(imgs_l, imgs_r):
        return jax.vmap(pair_fn)(imgs_l, imgs_r)

    spec = P("batch", "tile", None)
    # the per-shard result is replicated over dsh (every member holds the
    # full disparity map after the all_gather) — the vma checker cannot
    # infer that replication statically
    inner = jax.jit(shard_map(local_fn, mesh=mesh, in_specs=(spec, spec),
                              out_specs=spec, check_vma=False))
    return _pad_to_mesh(inner, mesh.shape["batch"], mesh.shape["tile"])


def _pad_to_mesh(inner, n_batch: int, n_tile: int):
    """Lift the B % batch-axis and H % tile-axis divisibility requirements
    by zero-padding before the shard_map and slicing after.  Padded batch
    entries are dropped exactly; padded image rows participate in the SGM
    vertical DP, so for non-divisible H the result equals the single-chip
    pipeline run on the bottom-zero-padded image (the difference to the
    unpadded image decays away from the seam; bit-exact when H divides)."""

    def run(imgs_l, imgs_r):
        B, H, _ = imgs_l.shape
        bp = (-B) % n_batch
        hp = (-H) % n_tile
        if bp or hp:
            pad = ((0, bp), (0, hp), (0, 0))
            out = inner(jnp.pad(imgs_l, pad), jnp.pad(imgs_r, pad))
            return out[:B, :H]
        return inner(imgs_l, imgs_r)

    return jax.jit(run)
