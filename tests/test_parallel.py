"""Multi-chip parity: the sharded pipelines must match single-chip outputs
bit-for-bit on an 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
import pytest

from libstevi_tpu.core import (MatchingFunction, ExtractionStrategy, MATCH_TRAITS)
from libstevi_tpu.ops import (unfold_based_cost_volume, extract_selected_index,
                              sgm_cost_volume)
from libstevi_tpu.parallel import (make_stereo_mesh, MeshSpec,
                                   distributed_cost_volume_wta,
                                   distributed_dense_stereo_step,
                                   dshard_wta, distributed_sgm)
from libstevi_tpu.parallel.stereo import distributed_full_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

H, W, D = 32, 24, 8


def _pair(rng):
    l = rng.uniform(0.1, 1, (H, W)).astype(np.float32)
    r = rng.uniform(0.1, 1, (H, W)).astype(np.float32)
    return jnp.asarray(l), jnp.asarray(r)


def test_row_sharded_cv_wta_matches_single_chip(rng):
    mesh = make_stereo_mesh(MeshSpec(tile=4), jax.devices()[:4])
    img_l, img_r = _pair(rng)
    fn = distributed_cost_volume_wta(mesh, MatchingFunction.ZNCC, 2, 2, D)
    got = np.asarray(fn(img_l, img_r))
    cv = unfold_based_cost_volume(MatchingFunction.ZNCC, img_l, img_r, 2, 2, D,
                                  backend="box")
    want = np.asarray(extract_selected_index(cv, ExtractionStrategy.SCORE))
    np.testing.assert_array_equal(got, want)


def test_distributed_sgm_matches_single_chip(rng):
    mesh = make_stereo_mesh(MeshSpec(tile=4), jax.devices()[:4])
    cv = rng.uniform(0, 1, (H, W, D)).astype(np.float32)

    fn = jax.jit(jax.shard_map(
        lambda c: distributed_sgm(c, 0.1, 0.4, axis_name="tile"),
        mesh=mesh, in_specs=P("tile",), out_specs=P("tile",)))
    got = np.asarray(fn(jnp.asarray(cv)))
    want = np.asarray(sgm_cost_volume(jnp.asarray(cv), 0.1, 0.4,
                                      n_directions=4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_dshard_wta_matches_single_chip(rng):
    mesh = make_stereo_mesh(MeshSpec(dsh=4), jax.devices()[:4])
    cv = rng.integers(0, 4, (H, W, D)).astype(np.float32)  # many ties

    # output is genuinely replicated after the all_gather reduction, but the
    # vma checker cannot infer that — disable it
    fn = jax.jit(jax.shard_map(
        lambda c: dshard_wta(c, ExtractionStrategy.COST),
        mesh=mesh, in_specs=P(None, None, "dsh"), out_specs=P(None, None),
        check_vma=False))
    got = np.asarray(fn(jnp.asarray(cv)))
    want = np.asarray(extract_selected_index(jnp.asarray(cv),
                                             ExtractionStrategy.COST))
    np.testing.assert_array_equal(got, want)


def test_full_step_batch_tile(rng):
    mesh = make_stereo_mesh(MeshSpec(batch=2, tile=4), jax.devices())
    B = 2
    ls = rng.uniform(0.1, 1, (B, H, W)).astype(np.float32)
    rs = rng.uniform(0.1, 1, (B, H, W)).astype(np.float32)
    fn = distributed_dense_stereo_step(mesh, MatchingFunction.CENSUS,
                                       2, 2, D, 2.0, 8.0)
    got = np.asarray(fn(jnp.asarray(ls), jnp.asarray(rs)))
    assert got.shape == (B, H, W)

    for b in range(B):
        cv = unfold_based_cost_volume(MatchingFunction.CENSUS,
                                      jnp.asarray(ls[b]), jnp.asarray(rs[b]),
                                      2, 2, D)
        sgm = sgm_cost_volume(cv, 2.0, 8.0, n_directions=4)
        want = np.asarray(extract_selected_index(sgm, ExtractionStrategy.COST))
        np.testing.assert_array_equal(got[b], want)


def test_full_step_three_axis_mesh(rng):
    """batch x tile x dsh: D-sharded ZNCC CV + relayed SGM must match the
    single-chip pipeline."""
    mesh = make_stereo_mesh(MeshSpec(batch=2, tile=2, dsh=2), jax.devices())
    B = 2
    ls = rng.uniform(0.1, 1, (B, H, W)).astype(np.float32)
    rs = rng.uniform(0.1, 1, (B, H, W)).astype(np.float32)
    fn = distributed_full_step(mesh, MatchingFunction.ZNCC, 2, 2, D, 0.1, 0.4)
    got = np.asarray(fn(jnp.asarray(ls), jnp.asarray(rs)))
    for b in range(B):
        cv = unfold_based_cost_volume(MatchingFunction.ZNCC,
                                      jnp.asarray(ls[b]), jnp.asarray(rs[b]),
                                      2, 2, D, backend="box")
        sgm = sgm_cost_volume(-cv, 0.1, 0.4, n_directions=4)
        want = np.asarray(extract_selected_index(sgm, ExtractionStrategy.COST))
        np.testing.assert_array_equal(got[b], want)


def test_distributed_fused_sgm_matches_single_chip(rng):
    """8- and 4-direction fused-kernel distributed SGM (carry relay incl.
    both diagonal families) == single-chip `sgm_cost_volume`, including
    shard heights that force padded kernel rows (H_loc=9 -> Hp=16, the
    carry pass-through path)."""
    import jax
    from jax.sharding import PartitionSpec as P
    from libstevi_tpu.ops.sgm import sgm_cost_volume
    from libstevi_tpu.parallel.sgm_dist import distributed_sgm_fused

    mesh4 = make_stereo_mesh(MeshSpec(tile=4), jax.devices()[:4])
    for H, W, D, nd in [(32, 20, 7, 8), (36, 13, 5, 8), (36, 13, 5, 4)]:
        cv = jnp.asarray(rng.uniform(0, 4, (H, W, D)).astype(np.float32))
        want = np.asarray(sgm_cost_volume(cv, 0.3, 1.1, Pout=7.0,
                                          n_directions=nd, backend="xla"))
        f = jax.shard_map(
            lambda c: distributed_sgm_fused(c, 0.3, 1.1, 7.0,
                                            n_directions=nd,
                                            interpret=True),
            mesh=mesh4, in_specs=P("tile"), out_specs=P("tile"),
            check_vma=False)
        got = np.asarray(jax.jit(f)(cv))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_distributed_full_step_8dir_matches_single_chip(rng):
    """The flagship multi-chip step with the fused 8-direction SGM ==
    single-chip pipeline (batch x tile x dsh mesh)."""
    mesh = make_stereo_mesh(MeshSpec(batch=2, tile=2, dsh=2),
                            jax.devices()[:8])
    B = 2
    ls = jnp.asarray(rng.uniform(0.1, 1, (B, H, W)).astype(np.float32))
    rs = jnp.asarray(rng.uniform(0.1, 1, (B, H, W)).astype(np.float32))
    step = distributed_full_step(mesh, MatchingFunction.ZNCC, 1, 1, D,
                                 P1=0.1, P2=0.5, n_directions=8)
    got = np.asarray(step(ls, rs))

    for b in range(B):
        cv = unfold_based_cost_volume(MatchingFunction.ZNCC, ls[b], rs[b],
                                      1, 1, D, backend="box")
        sgm = sgm_cost_volume(cv, 0.1, 0.5, n_directions=8,
                              strategy=ExtractionStrategy.SCORE,
                              backend="xla")
        want = np.asarray(extract_selected_index(
            sgm, ExtractionStrategy.SCORE))
        np.testing.assert_allclose(got[b], want, atol=1.0)
        exact = (got[b] == want).mean()
        assert exact > 0.99, exact


@pytest.mark.parametrize("func", [MatchingFunction.ZSSD,
                                  MatchingFunction.SAD,
                                  MatchingFunction.CENSUS])
def test_distributed_full_step_non_dot_families(rng, func):
    """The D-sharded pre-shift must reproduce each family's out-of-range
    convention (cost(src, 0-vector)), not just the dot family's zero."""
    mesh = make_stereo_mesh(MeshSpec(batch=1, tile=2, dsh=2),
                            jax.devices()[:4])
    B = 1
    ls = jnp.asarray(rng.uniform(0.1, 1, (B, H, W)).astype(np.float32))
    rs = jnp.asarray(rng.uniform(0.1, 1, (B, H, W)).astype(np.float32))
    step = distributed_full_step(mesh, func, 1, 1, D, P1=0.1, P2=0.5,
                                 n_directions=4)
    got = np.asarray(step(ls, rs))
    strategy = MATCH_TRAITS[func].strategy
    for b in range(B):
        cv = unfold_based_cost_volume(func, ls[b], rs[b], 1, 1, D)
        sgm = sgm_cost_volume(cv, 0.1, 0.5, n_directions=4,
                              strategy=strategy, backend="xla")
        want = np.asarray(extract_selected_index(sgm, strategy))
        exact = (got[b] == want).mean()
        assert exact > 0.99, (func, exact)


def test_distributed_full_step_non_divisible_shapes(rng):
    """B, H and D need not divide the mesh axes: padding + ceil-division
    D-sharding handle the remainders; parity is checked against the
    single-chip pipeline on the bottom-zero-padded image."""
    mesh = make_stereo_mesh(MeshSpec(batch=2, tile=2, dsh=2),
                            jax.devices()[:8])
    B, H2, D2 = 3, 30, 7                       # none divisible
    ls = jnp.asarray(rng.uniform(0.1, 1, (B, H2, W)).astype(np.float32))
    rs = jnp.asarray(rng.uniform(0.1, 1, (B, H2, W)).astype(np.float32))
    step = distributed_full_step(mesh, MatchingFunction.ZNCC, 1, 1, D2,
                                 P1=0.1, P2=0.5, n_directions=4)
    got = np.asarray(step(ls, rs))
    assert got.shape == (B, H2, W)
    hp = (-H2) % 2
    for b in range(B):
        lp = jnp.pad(ls[b], ((0, hp), (0, 0)))
        rp = jnp.pad(rs[b], ((0, hp), (0, 0)))
        cv = unfold_based_cost_volume(MatchingFunction.ZNCC, lp, rp,
                                      1, 1, D2, backend="box")
        sgm = sgm_cost_volume(cv, 0.1, 0.5, n_directions=4,
                              strategy=ExtractionStrategy.SCORE,
                              backend="xla")
        want = np.asarray(extract_selected_index(
            sgm, ExtractionStrategy.SCORE))[:H2]
        exact = (got[b] == want).mean()
        assert exact > 0.99, exact


def test_distributed_fused_sgm_dhw_matches_single_chip(rng):
    """The DHW-layout distributed SGM (disparity-on-sublanes shard
    kernels with (Dp, Wp) carry relay) == single-chip `sgm_cost_volume`,
    incl. shard heights forcing padded kernel rows (pass-through)."""
    import jax
    from jax.sharding import PartitionSpec as P
    from libstevi_tpu.ops.sgm import sgm_cost_volume
    from libstevi_tpu.parallel.sgm_dist import distributed_sgm_fused_dhw

    mesh4 = make_stereo_mesh(MeshSpec(tile=4), jax.devices()[:4])
    for H2, W2, D2, nd in [(32, 20, 7, 8), (36, 13, 5, 8), (36, 13, 5, 4)]:
        cv = jnp.asarray(rng.uniform(0, 4, (H2, W2, D2)).astype(np.float32))
        want = np.asarray(sgm_cost_volume(cv, 0.3, 1.1, Pout=7.0,
                                          n_directions=nd, backend="xla"))
        f = jax.shard_map(
            lambda c: distributed_sgm_fused_dhw(c, 0.3, 1.1, 7.0,
                                                n_directions=nd,
                                                interpret=True),
            mesh=mesh4, in_specs=P("tile"), out_specs=P("tile"),
            check_vma=False)
        got = np.asarray(jax.jit(f)(cv))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_distributed_fused_sgm_dhw_16dir_matches_single_chip(rng):
    """16-direction distributed SGM: knight carries relay across row
    shards in the down/up passes, and the horizontal knight families run
    after the all_to_all reshard to column shards — exact vs the
    single-chip 16-direction `sgm_cost_volume`."""
    import jax
    from jax.sharding import PartitionSpec as P
    from libstevi_tpu.ops.sgm import sgm_cost_volume
    from libstevi_tpu.parallel.sgm_dist import distributed_sgm_fused_dhw

    mesh4 = make_stereo_mesh(MeshSpec(tile=4), jax.devices()[:4])
    for H2, W2, D2 in [(32, 24, 7), (16, 24, 5)]:
        cv = jnp.asarray(rng.uniform(0, 4, (H2, W2, D2)).astype(np.float32))
        want = np.asarray(sgm_cost_volume(cv, 0.3, 1.1, Pout=7.0,
                                          n_directions=16, backend="xla"))
        f = jax.shard_map(
            lambda c: distributed_sgm_fused_dhw(c, 0.3, 1.1, 7.0,
                                                n_directions=16,
                                                interpret=True),
            mesh=mesh4, in_specs=P("tile"), out_specs=P("tile"),
            check_vma=False)
        got = np.asarray(jax.jit(f)(cv))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_distributed_16dir_odd_shards_and_nondivisible_w(rng):
    """Round-5: the 16-direction divisibility restrictions are lifted —
    odd shard heights ride the traced-parity knight shifts, and W that
    does not split into even per-shard columns is auto-padded around the
    all_to_all column stage.  Exact vs single-chip in every case."""
    import jax
    from jax.sharding import PartitionSpec as P
    from libstevi_tpu.ops.sgm import sgm_cost_volume
    from libstevi_tpu.parallel.sgm_dist import distributed_sgm_fused_dhw

    mesh4 = make_stereo_mesh(MeshSpec(tile=4), jax.devices()[:4])
    cases = [(36, 24, 5),    # H_loc = 9 (odd): traced drift parity
             (32, 22, 5),    # W % 4 != 0: right-pad to 24 (6/shard)
             (36, 28, 5)]    # both odd H_loc and odd W//n (7 -> 8/shard)
    for H2, W2, D2 in cases:
        cv = jnp.asarray(rng.uniform(0, 4, (H2, W2, D2)).astype(np.float32))
        want = np.asarray(sgm_cost_volume(cv, 0.3, 1.1, Pout=7.0,
                                          n_directions=16, backend="xla"))
        f = jax.shard_map(
            lambda c: distributed_sgm_fused_dhw(c, 0.3, 1.1, 7.0,
                                                n_directions=16,
                                                interpret=True),
            mesh=mesh4, in_specs=P("tile"), out_specs=P("tile"),
            check_vma=False)
        got = np.asarray(jax.jit(f)(cv))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4,
                                   err_msg=f"case {(H2, W2, D2)}")


def test_distributed_full_step_16dir_matches_single_chip(rng):
    """The flagship multi-chip step with 16-direction SGM (knight relay
    across row shards + all_to_all column stage) == single-chip."""
    mesh = make_stereo_mesh(MeshSpec(batch=1, tile=2, dsh=2),
                            jax.devices()[:4])
    B, H2, W2 = 1, 16, 24
    ls = jnp.asarray(rng.uniform(0.1, 1, (B, H2, W2)).astype(np.float32))
    rs = jnp.asarray(rng.uniform(0.1, 1, (B, H2, W2)).astype(np.float32))
    step = distributed_full_step(mesh, MatchingFunction.ZNCC, 1, 1, D,
                                 P1=0.1, P2=0.5, n_directions=16)
    got = np.asarray(step(ls, rs))
    for b in range(B):
        cv = unfold_based_cost_volume(MatchingFunction.ZNCC, ls[b], rs[b],
                                      1, 1, D, backend="box")
        sgm = sgm_cost_volume(cv, 0.1, 0.5, n_directions=16,
                              strategy=ExtractionStrategy.SCORE,
                              backend="xla")
        want = np.asarray(extract_selected_index(
            sgm, ExtractionStrategy.SCORE))
        exact = (got[b] == want).mean()
        assert exact > 0.99, exact


def test_distributed_fused_sgm_dhw_medium_shape_8dev(rng):
    """Non-toy shard shapes across all 8 virtual devices: H=48 rows over
    8 shards (H_loc=6 -> padded kernel rows on every shard), W=96 lanes,
    D=16 — exercises multi-chunk grids and the carry relay at realistic
    aspect ratios, exact vs single-chip."""
    import jax
    from jax.sharding import PartitionSpec as P
    from libstevi_tpu.ops.sgm import sgm_cost_volume
    from libstevi_tpu.parallel.sgm_dist import distributed_sgm_fused_dhw

    mesh8 = make_stereo_mesh(MeshSpec(tile=8), jax.devices()[:8])
    H2, W2, D2 = 48, 96, 16
    cv = jnp.asarray(rng.uniform(0, 4, (H2, W2, D2)).astype(np.float32))
    want = np.asarray(sgm_cost_volume(cv, 0.3, 1.1, Pout=7.0,
                                      n_directions=8, backend="xla"))
    f = jax.shard_map(
        lambda c: distributed_sgm_fused_dhw(c, 0.3, 1.1, 7.0,
                                            n_directions=8,
                                            interpret=True),
        mesh=mesh8, in_specs=P("tile"), out_specs=P("tile"),
        check_vma=False)
    got = np.asarray(jax.jit(f)(cv))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("nd", [8, 16])
def test_distributed_sgm_flagship_geometry(rng, nd):
    """Flagship-geometry distributed validation (VERDICT r4 #4): the
    row-sharded DHW SGM at 480x640 D=120 across all 8 virtual devices,
    8 and 16 directions, BIT-identical to the single-chip fused kernel
    path (same kernel arithmetic, carries relayed exactly)."""
    import jax
    from jax.sharding import PartitionSpec as P
    from libstevi_tpu.ops import sgm_pallas_dhw as dhw
    from libstevi_tpu.parallel.sgm_dist import distributed_sgm_fused_dhw

    H2, W2, D2 = 480, 640, 120
    cv = jnp.asarray(rng.uniform(0, 4, (H2, W2, D2)).astype(np.float32))

    # single-chip reference through the SAME fused kernel family
    adj = dhw.sgm_fused_adj_dhw(jnp.moveaxis(cv, -1, 1), 0, W2, 0.3, 1.1,
                                7.0, nd, interpret=True)
    assert adj is not None
    want = np.asarray(cv + jnp.moveaxis(adj, 1, -1))

    mesh8 = make_stereo_mesh(MeshSpec(tile=8), jax.devices()[:8])
    f = jax.shard_map(
        lambda c: distributed_sgm_fused_dhw(c, 0.3, 1.1, 7.0,
                                            n_directions=nd,
                                            interpret=True),
        mesh=mesh8, in_specs=P("tile"), out_specs=P("tile"),
        check_vma=False)
    got = np.asarray(jax.jit(f)(cv))
    np.testing.assert_array_equal(got, want)


def test_dense_stereo_step_8dir_batch_sharded(rng):
    """distributed_dense_stereo_step with the fused 8-direction Pallas
    path builds and matches single-chip (the vma checker cannot infer
    the Pallas outputs' sharding — regression for the check_vma gate)."""
    mesh = make_stereo_mesh(MeshSpec(batch=2, tile=2), jax.devices()[:4])
    B = 2
    ls = jnp.asarray(rng.uniform(0.1, 1, (B, H, W)).astype(np.float32))
    rs = jnp.asarray(rng.uniform(0.1, 1, (B, H, W)).astype(np.float32))
    fn = distributed_dense_stereo_step(mesh, MatchingFunction.ZNCC,
                                       1, 1, D, 0.1, 0.5, n_directions=8)
    got = np.asarray(fn(ls, rs))
    for b in range(B):
        cv = unfold_based_cost_volume(MatchingFunction.ZNCC, ls[b], rs[b],
                                      1, 1, D, backend="box")
        sgm = sgm_cost_volume(cv, 0.1, 0.5, n_directions=8,
                              strategy=ExtractionStrategy.SCORE,
                              backend="xla")
        want = np.asarray(extract_selected_index(
            sgm, ExtractionStrategy.SCORE))
        exact = (got[b] == want).mean()
        assert exact > 0.99, exact
