"""Fused Pallas kernel for the box-decomposed ZNCC/NCC/CC cost volume.

The scan-based box backend (`box_backend.py`) is exact but materializes
every per-disparity intermediate (product map, two separable box passes,
statistics slices) to HBM — ~12 MB of traffic per disparity, ~1.4 ms at
480x640 D=120.  This kernel keeps the source image, the padded target
and the precomputed window statistics resident in VMEM and writes ONLY
the cost volume: per grid step it computes a (disparity-chunk, row-band)
tile with

    cross_d = box(src * tgt_d)        (same-sign shift-add trees)
    cost    = (cross_d - sum_s sum_t_d / n) / (sigma_s sigma_t_d)

entirely in registers.  Row bands read a halo of ``v_radius`` rows from
the resident (8-row-padded) inputs via aligned dynamic slices; the
output is (D, Hp, Wp) — block (DC, Hb, Wp), trailing dims multiples of
(8, 128) — and the caller moves the axis for the (H, D, W) SGM layout
(an outer-dim move, minor dim preserved).

Parity: bit-comparable to `box_backend.box_cost_volume` up to float
reassociation (the window sums use a different add tree).  Reference:
`correlation/cross_correlations.h:195-311` semantics via the box
identities documented in `box_backend.py`.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import MatchingFunction

_PADROWS = 8                       # aligned halo reservoir above/below

# MXU-V experiment switch (round 5, NEGATIVE result — kept with the
# kernel support so the receipts reproduce): routing the V-window sum
# onto the MXU as a banded 0/1 matmul frees ~40% of the VPU window ops,
# but "default" matmul precision bf16-truncates the f32 window sums on
# input and the truncation error amplifies through the zcc cancellation
# on low-texture patches — measured prop_good 0.9995 -> 0.6761 on the
# warp parity fixture (scripts/exp_r5_parityprec.py) despite a 0.19 ms
# kernel-level win (scripts/exp_r5_cv.py).  "highest" (bf16x6
# multi-pass) is quality-neutral (same_halfpx 1.00000) but measures AT
# OR ABOVE the VPU tree in-context (scripts/exp_r5_mxuprec.py), so the
# production default is None: the exact VPU sublane shift-add tree.
MXU_V_PRECISION: str | None = None


def _one_sided_tree(x, r, sh):
    """Sum_{t=1..r} sh^t(x) as a same-sign shift-add tree.  Same-sign
    trees are EXACT under zero fill (each stage's clipped taps are taps
    beyond the array, which are zero anyway); mixing directions or
    recentering a one-sided running sum is not."""
    if r <= 0:
        return jnp.zeros_like(x)
    acc = sh(x, 1)
    width = 1
    while width * 2 <= r:
        acc = acc + sh(acc, width)
        width *= 2
    rem = r - width
    if rem:
        acc = acc + sh(_one_sided_tree(x, rem, sh), width)
    return acc


def _window_sum_lanes(x, radius):
    """Sum over lane offsets [-radius, radius] with zero fill."""
    zero = jnp.zeros_like(x)

    def sh_p(v, k):
        return jnp.concatenate([v[:, k:], zero[:, :k]], axis=1)

    def sh_n(v, k):
        return jnp.concatenate([zero[:, :k], v[:, :-k]], axis=1)

    return (x + _one_sided_tree(x, radius, sh_p)
            + _one_sided_tree(x, radius, sh_n))


def _window_sum_sublanes(x, radius):
    zero = jnp.zeros_like(x)

    def sh_p(v, k):
        return jnp.concatenate([v[k:], zero[:k]], axis=0)

    def sh_n(v, k):
        return jnp.concatenate([zero[:k], v[:-k]], axis=0)

    return (x + _one_sided_tree(x, radius, sh_p)
            + _one_sided_tree(x, radius, sh_n))


def _kernel(*refs, DC, Hb, Wp, Wpp, h_radius, v_radius, n, kind,
            cv_dtype, W1, negate=False, pad_d_inf=False, D=None, H1=None,
            pout_bake=None, banded=False, mxu_v=False, Dp_total=None):
    hb = pl.program_id(0)
    d_idx = pl.program_id(1)           # innermost: d chunks in order
    d0 = d_idx * DC
    Hx = Hb + 2 * _PADROWS
    pr = _PADROWS
    r0 = hb * Hb                       # aligned band start in padded rows

    refs = list(refs)
    bv_ref = refs.pop(9 if banded else 3) if mxu_v else None
    if banded:
        # big-geometry mode: the image/stat planes do NOT fit VMEM
        # whole, so each grid step streams the band plus its halo from
        # THREE shifted block views of the same arrays (prev/mid/next;
        # the arrays carry an extra full band of zero pad top and
        # bottom, so the maps h, h+1, h+2 never leave the array)
        (sp, sm, sn, tp_, tm, tn, stp, stm, stn, out_ref,
         scr_ref) = refs

        def band(prev, mid, nxt):
            return jnp.concatenate(
                [prev[..., Hb - pr:, :], mid[...], nxt[..., :pr, :]],
                axis=-2)

        @pl.when(d_idx == 0)
        def _():
            scr_ref[...] = band(tp_, tm, tn)

        src = band(sp, sm, sn)
        stats = band(stp, stm, stn)
        sum_s = stats[0]
        den_s = stats[1]
    else:
        src_ref, tgtp_ref, stats_ref, out_ref, scr_ref = refs

        # Mosaic supports dynamic SUBLANE slices but not dynamic LANE
        # slices: the target stack rides in a scratch loaded at the
        # band's first d-chunk and shifted left by a STATIC DC lanes
        # per chunk, so every per-disparity slice below is static.
        @pl.when(d_idx == 0)
        def _():
            scr_ref[...] = tgtp_ref[:, pl.ds(r0, Hx), :]

        src = src_ref[pl.ds(r0, Hx), :]
        sum_s = stats_ref[0, pl.ds(r0, Hx), :]
        den_s = stats_ref[1, pl.ds(r0, Hx), :]  # sigma (Z*) or |s| (NCC)
    tgt_b = scr_ref[...]

    jj = jax.lax.broadcasted_iota(jnp.int32, (Hb, Wp), 1)
    c = slice(_PADROWS, _PADROWS + Hb)
    if pad_d_inf and D is not None and Dp_total is not None \
            and Dp_total - D >= DC:
        # the volume's d-pad spans at least one whole chunk (e.g. D=120
        # -> Dp=128 bf16): that chunk is pure inf-pattern — skip its
        # window sums and scratch advance entirely (the next grid step
        # is a new band's d_idx==0, which reloads the scratch)
        ii0 = jax.lax.broadcasted_iota(jnp.int32, (Hb, Wp), 0) + r0
        infpat0 = jnp.where((ii0 < H1) & (jj < W1),
                            jnp.float32(jnp.inf), 0.0).astype(cv_dtype)

        @pl.when(d0 >= D)
        def _():
            for k in range(DC):
                out_ref[k] = infpat0

        @pl.when(d0 < D)
        def _():
            _kernel_body(src, tgt_b, sum_s, den_s, out_ref, scr_ref,
                         d0, jj, c, DC=DC, Hx=Hx, Wp=Wp,
                         h_radius=h_radius, v_radius=v_radius, n=n,
                         kind=kind, cv_dtype=cv_dtype, W1=W1,
                         negate=negate, pad_d_inf=pad_d_inf, D=D, H1=H1,
                         r0=r0, pout_bake=pout_bake, mxu_v=mxu_v,
                         bv_ref=bv_ref)
        return
    _kernel_body(src, tgt_b, sum_s, den_s, out_ref, scr_ref, d0, jj, c,
                 DC=DC, Hx=Hx, Wp=Wp, h_radius=h_radius,
                 v_radius=v_radius, n=n, kind=kind, cv_dtype=cv_dtype,
                 W1=W1, negate=negate, pad_d_inf=pad_d_inf, D=D, H1=H1,
                 r0=r0, pout_bake=pout_bake, mxu_v=mxu_v, bv_ref=bv_ref)


def _kernel_body(src, tgt_b, sum_s, den_s, out_ref, scr_ref, d0, jj, c,
                 *, DC, Hx, Wp, h_radius, v_radius, n, kind, cv_dtype,
                 W1, negate, pad_d_inf, D, H1, r0, pout_bake, mxu_v,
                 bv_ref):
    for k in range(DC):
        t_d = jax.lax.slice_in_dim(tgt_b[0], k, k + Wp, axis=1)
        if mxu_v:
            # vertical window on the MXU as a banded 0/1 matmul —
            # (Hb, Hx) @ (Hx, Wp), f32 accumulate — freeing the VPU's
            # sublane shift-add tree on the issue-limited d loop
            # (measured 0.66 vs 0.86 ms/volume at 480x640 D=120 bf16 at
            # default precision).  Precision matters: "default"
            # bf16-truncates the f32 window sums on input, and the
            # truncation error amplifies through the zcc cancellation —
            # measured 0.70 px mean disparity drift vs f32 on noise
            # images; "highest" (bf16x6 multi-pass) is ~f32-exact.
            # Reserved for bf16 volumes; f32 keeps the exact VPU tree.
            prec = jax.lax.Precision(mxu_v)
            cross = jax.lax.dot_general(
                bv_ref[...], _window_sum_lanes(src * t_d, h_radius),
                (((1,), (0,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32)
        else:
            cross = _window_sum_sublanes(
                _window_sum_lanes(src * t_d, h_radius), v_radius)[c]
        if kind == "cc":
            cost = cross
        elif kind == "ncc":
            # inverse sigmas (see _prep_inputs): two multiplies, the
            # zero-sigma mask rides the zero inverse
            den_t = jax.lax.slice_in_dim(tgt_b[2], k, k + Wp, axis=1)[c]
            cost = cross * den_s[c] * den_t
        else:                          # zcc / zncc
            sum_t = jax.lax.slice_in_dim(tgt_b[1], k, k + Wp, axis=1)[c]
            zcc = cross - sum_s[c] * sum_t * (1.0 / n)
            if kind == "zcc":
                cost = zcc
            else:
                den_t = jax.lax.slice_in_dim(tgt_b[2], k,
                                             k + Wp, axis=1)[c]
                cost = zcc * den_s[c] * den_t
        if negate:
            cost = -cost
        in_range = jj + (d0 + k) < W1
        # ``pout_bake``: write Pout at out-of-range (j + d >= W) entries
        # instead of 0 — the SGM out-of-image penalty rides the cost
        # stream, so the DP kernels drop their per-carry +Pout adds (the
        # in-range cost there is 0, so cv' is EITHER cost OR Pout and
        # the DP carries stay bit-identical); the WTA pass restores the
        # direction multiplicity once (see `_dhw_wta_kernel`)
        if pout_bake is None:
            val = jnp.where(in_range, cost, 0.0)
        else:
            # padded lanes (jj >= W1) must stay exact zero
            val = jnp.where(in_range, cost,
                            jnp.where(jj < W1, float(pout_bake), 0.0))
        if pad_d_inf:
            # d sublanes beyond the true disparity range carry +inf at
            # real (i, j) positions and zero at padded ones — exactly
            # the pad pattern `sgm_pallas_dhw._run_dhw` builds, so the
            # volume feeds the SGM kernels with no relayout/pad op.
            # Padded image rows must be EXACT zeros (the un-normalized
            # cc/zcc kinds see real rows through the window there, and
            # diagonal carries lane-shift pad values into real lanes).
            ii = jax.lax.broadcasted_iota(jnp.int32, jj.shape, 0) + r0
            infpat = jnp.where((ii < H1) & (jj < W1), jnp.float32(jnp.inf),
                               0.0)
            val = jnp.where(d0 + k < D, jnp.where(ii < H1, val, 0.0),
                            infpat)
        out_ref[k] = val.astype(cv_dtype)
    # advance the scratch to the next chunk's base disparity
    zfill = jnp.zeros((3, Hx, DC), tgt_b.dtype)
    scr_ref[...] = jnp.concatenate([tgt_b[:, :, DC:], zfill], axis=2)


# Resident-mode configurations measured to COMPILE AND RUN above the
# conservative estimate (the 8-tile `temps` term overcounts Mosaic's
# live-register reuse; e.g. the flagship 480x640 D=120 bf16 at Hb=240
# compiles at estimate ~22 MB and runs 6% faster than Hb=48 — the
# smaller band pays (Hb+16)/Hb halo overcompute on every window sum).
# Keyed by (Hp, Hb, Wp, Wpp, out_itemsize) — Hp must be in the key: the
# resident image/stat planes scale with it, so a verification at one
# height must not admit a taller image's genuinely-larger residents.
_FUSED_VERIFIED = {(480, 240, 640, 776, 2), (480, 96, 640, 776, 2)}
# Acceptance bounds shift with the scoped-VMEM pool size when
# LIBTPU_INIT_ARGS raises it (utils/vmem.py) — at the default 16 MB pool
# they equal the calibrated constants exactly.
from ..utils.vmem import scope_delta as _scope_delta
_FUSED_EST_HARD = 15_000_000 + _scope_delta()
_FUSED_EST_CALIB = 23_000_000 + _scope_delta()


def box_fused_in_scope(func: MatchingFunction, shape, h_radius: int,
                       v_radius: int, disp_width: int,
                       cv_dtype=jnp.float32):
    """Static (shape-only) scope check for `box_cost_volume_fused`:
    returns the row-band height Hb when the configuration is supported
    and fits the 16 MB scoped VMEM, else None.  Lets dispatch decide
    without tracing the kernel."""
    kind = {MatchingFunction.CC: "cc", MatchingFunction.NCC: "ncc",
            MatchingFunction.ZCC: "zcc",
            MatchingFunction.ZNCC: "zncc"}.get(func)
    if kind is None or len(shape) != 2 or v_radius > _PADROWS:
        return None
    H, W = shape
    DC = 8
    Dp = -(-disp_width // DC) * DC
    Hp = -(-H // 8) * 8
    Wp = -(-W // 128) * 128
    Wpp = Wp + Dp + DC

    # pick the largest row band whose residents + out blocks + live band
    # temporaries fit the 16 MB scoped VMEM; configurations measured to
    # compile above the (over-counting) estimate are admitted from the
    # verified registry, unverified ones hold to the hard bound
    isz = 4
    osz = jnp.dtype(cv_dtype).itemsize
    # full-height bands are admitted only for small images: at a raised
    # scoped pool Hb=480 COMPILES for the flagship but runs SLOWER than
    # Hb=240 (0.98 vs 0.79 ms measured — scripts/exp_r5_vmemflag.py:
    # the larger working set hurts locality), so the candidate order
    # keeps the measured sweet spot first for tall images.
    cands = (Hp, 240, 120, 96, 48, 24) if Hp <= 240 \
        else (240, 120, 96, 48, 24)
    for cand in cands:
        if cand > Hp or cand % 8 or Hp % cand:
            continue
        hx = cand + 2 * _PADROWS
        resident = ((Hp + 2 * _PADROWS) * (4 * Wp + 3 * Wpp)) * isz
        scratch = 3 * hx * Wpp * isz
        temps = 8 * hx * Wp * isz
        out_c = 2 * DC * cand * Wp * osz
        est = resident + scratch + temps + out_c
        if est <= _FUSED_EST_HARD:
            return cand
        if est <= _FUSED_EST_CALIB and (Hp, cand, Wp, Wpp,
                                        osz) in _FUSED_VERIFIED:
            return cand
    return None


# Banded-mode configurations measured to COMPILE above the conservative
# estimate (the 2x double-buffer term of the estimator overcounts; e.g.
# 720p D=320 at Hb=48 compiles at estimate 16.8 MB against the 16 MB
# scoped limit).  Keyed by (Hb, Wp, Wpp): the VMEM-relevant dims.  An
# UNVERIFIED geometry whose estimate exceeds the real scoped limit falls
# through to the next (smaller) band instead of risking a hard Mosaic
# compile failure at runtime (the smaller band costs halo-recompute
# waste, not correctness).
_BANDED_VERIFIED = {(48, 1280, 1608)}
_BANDED_EST_HARD = 15_900_000 + _scope_delta()   # scoped pool minus margin
_BANDED_EST_CALIB = 17_000_000 + _scope_delta()  # calibrated overcount


def box_fused_banded_in_scope(func, shape, h_radius, v_radius, Dp,
                              cv_dtype=jnp.float32):
    """Band height for the BANDED fused CV — big geometries whose full
    image/stat residents exceed VMEM (720p at large D): per grid step
    the kernel streams prev/mid/next band blocks of every plane.
    Returns Hb or None.  Same hard scope limits as the resident kernel:
    dot-family cost, 2-D gray images, v_radius <= the 8-row halo (the
    neighbor blocks only contribute _PADROWS rows each side)."""
    kind = {MatchingFunction.CC: "cc", MatchingFunction.NCC: "ncc",
            MatchingFunction.ZCC: "zcc",
            MatchingFunction.ZNCC: "zncc"}.get(func)
    if kind is None or len(shape) != 2 or v_radius > _PADROWS or Dp % 8:
        return None
    H, W = shape
    DC = 8
    Hp = -(-H // 8) * 8
    Wp = -(-W // 128) * 128
    Wpp = Wp + Dp + DC
    isz = 4
    osz = jnp.dtype(cv_dtype).itemsize
    for cand in (48, 40, 32, 24, 16, 8):
        if cand > Hp or cand % 8 or Hp % cand or cand < _PADROWS:
            continue
        hx = cand + 2 * _PADROWS
        streams = 2 * 3 * cand * (Wp + 3 * Wpp + 2 * Wp) * isz
        scratch = 3 * hx * Wpp * isz
        temps = (8 * hx + 3 * hx) * Wp * isz    # band temps + assembly
        out_c = 2 * DC * cand * Wp * osz
        # larger bands halve the halo recompute waste (hx/cand: 1.33x at
        # 48 vs 1.67x at 24 -> 7.6 vs 9.0 ms), so accept up to the
        # calibrated overcount allowance — but only for geometries
        # verified to compile (`_BANDED_VERIFIED`); unverified ones hold
        # to the real scoped limit rather than hard-fail in Mosaic
        est = streams + scratch + temps + out_c
        if est <= _BANDED_EST_HARD:
            return cand
        if est <= _BANDED_EST_CALIB and (cand, Wp, Wpp) in _BANDED_VERIFIED:
            return cand
    return None


def _prep_inputs(kind, img_l, img_r, h_radius, v_radius, Hp, Wp, Wpp):
    """Window statistics in normal (H-major) orientation, pr-row-padded:
    returns (srcp, tgt_stack, stats_s) with srcp (Hpp, Wp), stats_s
    (2, Hpp, Wp) = [sum_s, den_s], tgt_stack (3, Hpp, Wpp) =
    [tgt, sum_t, den_t]."""
    H, W = img_l.shape
    src = img_r.astype(jnp.float32)       # RIGHT_TO_LEFT: source = right
    tgt = img_l.astype(jnp.float32)
    n = float((2 * h_radius + 1) * (2 * v_radius + 1))

    from .filters import box_filter_2d

    def box(x):
        return box_filter_2d(x, h_radius, v_radius)

    pr = _PADROWS
    srcp = jnp.pad(src, ((0, Hp - H), (0, Wp - W)))
    tgtp = jnp.pad(tgt, ((0, Hp - H), (0, Wpp - W)))

    sum_s = box(srcp)
    sum_s2 = box(srcp * srcp)
    # max(0, .): float cancellation on flat patches makes the variance
    # term slightly negative -> sqrt NaN (see box_backend note)
    den_s = jnp.sqrt(sum_s2) if kind == "ncc" \
        else jnp.sqrt(jnp.maximum(sum_s2 - sum_s * sum_s / n, 0.0))
    sum_t = box(tgtp)
    sum_t2 = box(tgtp * tgtp)
    den_t = jnp.sqrt(sum_t2) if kind == "ncc" \
        else jnp.sqrt(jnp.maximum(sum_t2 - sum_t * sum_t / n, 0.0))
    # the normalized kinds store INVERSE sigmas (0 where sigma == 0):
    # the kernel's per-disparity `cost = where(den > 0, x / den, 0)`
    # collapses to two multiplies — the zero-sigma mask propagates
    # through the zero inverse exactly (x is always finite)
    if kind in ("ncc", "zncc"):
        den_s = jnp.where(den_s > 0, 1.0 / jnp.where(den_s > 0, den_s,
                                                     1.0), 0.0)
        den_t = jnp.where(den_t > 0, 1.0 / jnp.where(den_t > 0, den_t,
                                                     1.0), 0.0)

    rowpad = ((pr, pr), (0, 0))
    srcp = jnp.pad(srcp, rowpad)
    stats_s = jnp.pad(jnp.stack([sum_s, den_s]), ((0, 0),) + rowpad)
    tgt_stack = jnp.pad(jnp.stack([tgtp, sum_t, den_t]),
                        ((0, 0),) + rowpad)
    return srcp, tgt_stack, stats_s, n


def _fused_call(kind, img_l, img_r, h_radius, v_radius, D, Dp, Hb,
                cv_dtype, interpret, negate, pad_d_inf, pout_bake=None,
                banded=False):
    H, W = img_l.shape
    DC = 8
    Hp = -(-H // 8) * 8
    Wp = -(-W // 128) * 128
    Wpp = Wp + Dp + DC
    pr = _PADROWS
    srcp, tgt_stack, stats_s, n = _prep_inputs(
        kind, img_l, img_r, h_radius, v_radius, Hp, Wp, Wpp)
    # bf16 volumes route the V-window to the MXU at MXU_V_PRECISION;
    # f32 volumes keep the exact VPU sublane tree (reference-parity
    # path).  mxu_v carries the precision string (or False).
    mxu_v = MXU_V_PRECISION if (
        MXU_V_PRECISION is not None
        and jnp.dtype(cv_dtype) == jnp.dtype(jnp.bfloat16)) else False

    kern = functools.partial(
        _kernel, DC=DC, Hb=Hb, Wp=Wp, Wpp=Wpp, h_radius=h_radius,
        v_radius=v_radius, n=n, kind=kind, cv_dtype=cv_dtype, W1=W,
        negate=negate, pad_d_inf=pad_d_inf, D=D, H1=H,
        pout_bake=pout_bake, banded=banded, mxu_v=mxu_v, Dp_total=Dp)
    Hpp = Hp + 2 * pr
    Hx = Hb + 2 * pr
    out_spec = pl.BlockSpec((DC, Hb, Wp), lambda h, d: (d, h, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((Dp, Hp, Wp), cv_dtype)
    scratch = [pltpu.VMEM((3, Hx, Wpp), jnp.float32)]
    bv_spec = []
    bv_arg = ()
    if mxu_v:
        rows = np.arange(Hb)[:, None]
        cols = np.arange(Hx)[None, :]
        bv_arg = (jnp.asarray(
            (np.abs(cols - (rows + pr)) <= v_radius).astype(np.float32)),)
        bv_spec = [pl.BlockSpec((Hb, Hx), lambda h, d: (0, 0),
                                memory_space=pltpu.VMEM)]
    if not banded:
        return pl.pallas_call(
            kern, grid=(Hp // Hb, Dp // DC),
            in_specs=[pl.BlockSpec((Hpp, Wp), lambda h, d: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((3, Hpp, Wpp), lambda h, d: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((2, Hpp, Wp), lambda h, d: (0, 0, 0),
                                   memory_space=pltpu.VMEM)] + bv_spec,
            out_specs=out_spec, out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret)(srcp, tgt_stack, stats_s, *bv_arg)

    # banded: pad a FULL band of rows top and bottom so the prev/mid/
    # next block views (maps h, h+1, h+2) never leave the arrays
    ext = Hb - pr
    srcb = jnp.pad(srcp, ((ext, ext), (0, 0)))
    tgtb = jnp.pad(tgt_stack, ((0, 0), (ext, ext), (0, 0)))
    stab = jnp.pad(stats_s, ((0, 0), (ext, ext), (0, 0)))

    def m2(k):
        return pl.BlockSpec((Hb, Wp), lambda h, d, k=k: (h + k, 0),
                            memory_space=pltpu.VMEM)

    def m3t(k):
        return pl.BlockSpec((3, Hb, Wpp), lambda h, d, k=k: (0, h + k, 0),
                            memory_space=pltpu.VMEM)

    def m3s(k):
        return pl.BlockSpec((2, Hb, Wp), lambda h, d, k=k: (0, h + k, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern, grid=(Hp // Hb, Dp // DC),
        in_specs=[m2(0), m2(1), m2(2), m3t(0), m3t(1), m3t(2),
                  m3s(0), m3s(1), m3s(2)] + bv_spec,
        out_specs=out_spec, out_shape=out_shape, scratch_shapes=scratch,
        interpret=interpret)(srcb, srcb, srcb, tgtb, tgtb, tgtb,
                             stab, stab, stab, *bv_arg)


def box_cost_volume_fused(func: MatchingFunction, img_l, img_r,
                          h_radius: int, v_radius: int, disp_width: int,
                          cv_dtype=jnp.float32,
                          interpret: bool | None = None):
    """Fused (H, D, W) cost volume for the dot family (CC/NCC/ZCC/ZNCC),
    RIGHT_TO_LEFT, zero margins, gray images.  Returns None when the
    configuration is out of scope or cannot fit VMEM (caller falls back
    to the scan backend)."""
    kind = {MatchingFunction.CC: "cc", MatchingFunction.NCC: "ncc",
            MatchingFunction.ZCC: "zcc",
            MatchingFunction.ZNCC: "zncc"}.get(func)
    Hb = box_fused_in_scope(func, img_l.shape, h_radius, v_radius,
                            disp_width, cv_dtype)
    if Hb is None:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W = img_l.shape
    D = disp_width
    Dp = -(-D // 8) * 8
    out = _fused_call(kind, img_l, img_r, h_radius, v_radius, D, Dp, Hb,
                      cv_dtype, interpret, negate=False, pad_d_inf=False)
    # (D, H, W) -> (H, D, W): outer-dim move, minor dim preserved
    return jnp.moveaxis(out[:D, :H, :W], 0, 1)


def box_cost_volume_fused_padded(func: MatchingFunction, img_l, img_r,
                                 h_radius: int, v_radius: int,
                                 disp_width: int, Dp: int,
                                 cv_dtype=jnp.float32, negate: bool = False,
                                 pout_bake=None,
                                 interpret: bool | None = None):
    """The fused cost volume in the SGM-kernel-ready padded layout
    (Hp, Dp, Wp): rows/cols zero-padded to (8, 128) multiples, d padded
    to ``Dp`` with the +inf-at-real-pixels pattern, optionally negated
    (SCORE volumes feed the COST-mode SGM kernels negated).  The only
    post-kernel op is the outer-dim d<->row move (minor dim preserved,
    ~bandwidth); the slice/pad/negate copies of the compose-it-yourself
    chain all disappear.  Returns None out of scope."""
    kind = {MatchingFunction.CC: "cc", MatchingFunction.NCC: "ncc",
            MatchingFunction.ZCC: "zcc",
            MatchingFunction.ZNCC: "zncc"}.get(func)
    if kind is None or Dp % 8 or Dp < disp_width:
        return None
    banded = False
    Hb = box_fused_in_scope(func, img_l.shape, h_radius, v_radius,
                            Dp, cv_dtype)
    if Hb is None:
        # big geometry: stream prev/mid/next band blocks instead of
        # keeping the whole planes resident (e.g. 720p D=320)
        Hb = box_fused_banded_in_scope(func, img_l.shape, h_radius,
                                       v_radius, Dp, cv_dtype)
        banded = Hb is not None
    if Hb is None:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _fused_call(kind, img_l, img_r, h_radius, v_radius, disp_width,
                      Dp, Hb, cv_dtype, interpret, negate=negate,
                      pad_d_inf=True, pout_bake=pout_bake, banded=banded)
    return jnp.moveaxis(out, 0, 1)        # (Hp, Dp, Wp), minor dim kept
