"""Round-4 NEGATIVE RESULT, kept for the record: a transposed-layout
(W-major) fused box-CV builder.

Hypothesis (VERDICT r3 next-round #1a): emitting the (W, D, H) cost
volume directly from a second axis-swapped kernel invocation (~0.25 ms
from the 1.2 MB images) should beat transposing the 74 MB volume
(~0.4-0.65 ms XLA tile relayout).

Measured (interleaved min-of-6 on v5e, full flagship pipeline, bf16):
  - both-native-builders pipeline: 4.37 ms min / ~4.5 ms typ
  - native rows builder + XLA transpose for cv_T: 3.39 ms min / ~4.0 typ
  - old compose-it-yourself chain: 3.98 ms min / ~4.25 typ

The transposed builder LOSES ~0.9 ms to the XLA transpose: in
transposed image space the per-disparity shift lands on SUBLANES, and
Mosaic only allows 8-aligned dynamic sublane offsets, so every d chunk
pays 3 aligned plane loads plus 24 unaligned static sublane SHIFTS of
(Wx, Hl) values (~70 vregs each) — pure relayout work the normal
kernel's lane-slide scratch avoids.  The production pipeline
(`ops/sgm.dense_sgm_stereo`) therefore uses
`box_cost_volume_fused_padded` plus one fused XLA transpose.

Bit-exact vs `to_T(box_cost_volume_fused_padded(...))` — validated by
scripts/exp_native_cv.py, which imports the builder from here.
"""

import sys

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libstevi_tpu.core.types import MatchingFunction
from libstevi_tpu.ops.box_pallas import (_PADROWS, _prep_inputs,
                                         _window_sum_lanes,
                                         _window_sum_sublanes)


def _kernel_T(src_ref, tgt_ref, stats_ref, out_ref, *, DC, Wb, Hl,
              h_radius, v_radius, n, kind, cv_dtype, W1, H1, D, negate):
    wb = pl.program_id(0)
    d_idx = pl.program_id(1)
    d0 = d_idx * DC
    Wx = Wb + 2 * _PADROWS
    r0 = wb * Wb                       # band start (image column)

    src = src_ref[pl.ds(r0, Wx), :]
    sum_s = stats_ref[0, pl.ds(r0, Wx), :]
    den_s = stats_ref[1, pl.ds(r0, Wx), :]

    ii = jax.lax.broadcasted_iota(jnp.int32, (Wb, Hl), 1)   # image row
    jj = jax.lax.broadcasted_iota(jnp.int32, (Wb, Hl), 0) + r0
    c = slice(_PADROWS, _PADROWS + Wb)
    infpat = jnp.where((ii < H1) & (jj < W1), jnp.float32(jnp.inf), 0.0)
    # Mosaic only allows dynamic SUBLANE offsets that are provable
    # multiples of 8: load each plane once per d-chunk at the aligned
    # offset r0 + d0 (both multiples of 8) with DC extra rows, and apply
    # the remaining k in [0, DC) as a STATIC value slice (vreg shifts).
    tgt_b = tgt_ref[0, pl.ds(r0 + d0, Wx + DC), :]
    sum_tb = tgt_ref[1, pl.ds(r0 + d0, Wx + DC), :] \
        if kind in ("zcc", "zncc") else None
    den_tb = tgt_ref[2, pl.ds(r0 + d0, Wx + DC), :] \
        if kind in ("ncc", "zncc") else None

    def at_k(plane, k):
        return jax.lax.slice_in_dim(plane, k, k + Wx, axis=0)

    for k in range(DC):
        t_d = at_k(tgt_b, k)
        # h-window on sublanes FIRST, then v-window on lanes: the same
        # per-element summation tree as the normal kernel (h on lanes
        # first there) -> bit-identical cross terms
        cross = _window_sum_lanes(
            _window_sum_sublanes(src * t_d, h_radius), v_radius)[c]
        if kind == "cc":
            cost = cross
        elif kind == "ncc":
            # _prep_inputs stores INVERSE sigmas for the normalized kinds
            cost = cross * den_s[c] * at_k(den_tb, k)[c]
        else:                          # zcc / zncc
            zcc = cross - sum_s[c] * at_k(sum_tb, k)[c] * (1.0 / n)
            if kind == "zcc":
                cost = zcc
            else:
                cost = zcc * den_s[c] * at_k(den_tb, k)[c]
        if negate:
            cost = -cost
        # padded image rows (lanes >= H1) must be exact zeros: the
        # un-normalized cc/zcc kinds see real rows through the v-window
        val = jnp.where((jj + (d0 + k) < W1) & (ii < H1), cost, 0.0)
        val = jnp.where(d0 + k < D, val, infpat)
        out_ref[k] = val.astype(cv_dtype)


def box_fused_T_in_scope(func: MatchingFunction, shape, h_radius: int,
                         v_radius: int, Dp: int, cv_dtype=jnp.float32):
    """Returns the column-band width Wb when the transposed builder
    supports the configuration within scoped VMEM, else None."""
    kind = {MatchingFunction.CC: "cc", MatchingFunction.NCC: "ncc",
            MatchingFunction.ZCC: "zcc",
            MatchingFunction.ZNCC: "zncc"}.get(func)
    if kind is None or len(shape) != 2 or h_radius > _PADROWS or Dp % 8:
        return None
    H, W = shape
    DC = 8
    Wp = -(-W // 128) * 128
    Hl = -(-H // 128) * 128
    Wpp = Wp + Dp + DC
    isz = 4
    osz = jnp.dtype(cv_dtype).itemsize
    for cand in (Wp, 320, 256, 128, 64, 32, 16, 8):
        if cand > Wp or cand % 8 or Wp % cand:
            continue
        wx = cand + 2 * _PADROWS
        resident = ((Wp + 2 * _PADROWS) * 3 + (Wpp + 2 * _PADROWS) * 3) \
            * Hl * isz
        # live tiles: ~8 window-sum intermediates + the 3 per-chunk
        # aligned plane loads (wx + DC rows each)
        temps = (8 * wx + 3 * (wx + DC)) * Hl * isz
        out_c = 2 * DC * cand * Hl * osz
        if resident + temps + out_c <= 15_000_000:
            return cand
    return None


def box_cost_volume_fused_T(func: MatchingFunction, img_l, img_r,
                            h_radius: int, v_radius: int, disp_width: int,
                            Dp: int, cv_dtype=jnp.float32,
                            negate: bool = False,
                            interpret: bool | None = None):
    """The fused cost volume in the TRANSPOSED padded layout
    (Wp, Dp, Hl).  Bit-identical to transposing the output of
    `box_cost_volume_fused_padded`.  Returns None out of scope."""
    kind = {MatchingFunction.CC: "cc", MatchingFunction.NCC: "ncc",
            MatchingFunction.ZCC: "zcc",
            MatchingFunction.ZNCC: "zncc"}.get(func)
    if kind is None or Dp % 8 or Dp < disp_width:
        return None
    Wb = box_fused_T_in_scope(func, img_l.shape, h_radius, v_radius, Dp,
                              cv_dtype)
    if Wb is None:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W = img_l.shape
    DC = 8
    Hp = -(-H // 8) * 8
    Wp = -(-W // 128) * 128
    Hl = -(-H // 128) * 128
    Wpp = Wp + Dp + DC
    pr = _PADROWS
    srcp, tgt_stack, stats_s, n = _prep_inputs(
        kind, img_l, img_r, h_radius, v_radius, Hp, Wp, Wpp)

    # transpose the 1.2 MB planes (cheap), strip the normal-orientation
    # row pads, re-pad in transposed orientation
    def to_T(x, rows):
        xt = jnp.swapaxes(x[..., pr:pr + Hp, :rows], -1, -2)
        return jnp.pad(xt, [(0, 0)] * (x.ndim - 2)
                       + [(pr, pr), (0, Hl - Hp)])

    srcT = to_T(srcp, Wp)
    stats_T = to_T(stats_s, Wp)
    tgt_T = to_T(tgt_stack, Wpp)

    kern = functools.partial(
        _kernel_T, DC=DC, Wb=Wb, Hl=Hl, h_radius=h_radius,
        v_radius=v_radius, n=n, kind=kind, cv_dtype=cv_dtype, W1=W, H1=H,
        D=disp_width, negate=negate)
    out = pl.pallas_call(
        kern, grid=(Wp // Wb, Dp // DC),
        in_specs=[pl.BlockSpec((Wp + 2 * pr, Hl), lambda w, d: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, Wpp + 2 * pr, Hl),
                               lambda w, d: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((2, Wp + 2 * pr, Hl),
                               lambda w, d: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((DC, Wb, Hl), lambda w, d: (d, w, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Dp, Wp, Hl), cv_dtype),
        interpret=interpret)(srcT, tgt_T, stats_T)
    return jnp.moveaxis(out, 0, 1)        # (Wp, Dp, Hl), minor dim kept
