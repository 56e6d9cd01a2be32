"""Fused Pallas aggregation of feature-volume cost volumes.

Reference parity: `aggregateCost` (`cross_correlations.h:195-250`) — the
O(H W D F) loop nest comparing source features against d-shifted target
features.  The XLA formulation (`cost_volume._shifted_compare_scan`) re-reads
both full feature volumes from HBM on every one of the D scan steps
(~14 GB of traffic at 480p D=120 F=49, measured ~30 ms).  This kernel
streams each feature volume ONCE: a row-chunk of both volumes sits in VMEM
while all D shifted comparisons run as lane-slices + sublane reductions,
writing the (rc, D, W) output tile in place.

Layout: features on sublanes, image columns on lanes ((H, F, W) transposed
volumes), so a disparity shift is a static lane slice and the F-reduction
is a sublane sum.  Output is (H, D, W) — the DHW layout the SGM Pallas
fast path consumes natively — or (H, W, D) on request.

Covers the elementwise comparison families 'dot' (CC/NCC/ZCC/ZNCC after
normalization), 'ssd' (SSD/ZSSD) and 'sad' (SAD/ZSAD); median (MEDAD),
Hamming (CENSUS) and KERMI stay on the scan path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FUSABLE_KERNELS = ("dot", "ssd", "sad")


def _round_up(x, m):
    return (x + m - 1) // m * m


def _fv_kernel(src_ref, tgt_ref, out_ref, *, RC, F, Dp, Wp, kernel,
               shifts, pad_l):
    for rr in range(RC):
        a = src_ref[rr]                          # (Fp, Wp)
        t = tgt_ref[rr]                          # (Fp, Wtp)
        for di, shift in enumerate(shifts):
            b = t[:, pad_l + shift:pad_l + shift + Wp]
            if kernel == "dot":
                e = a * b
            elif kernel == "ssd":
                d = a - b
                e = d * d
            else:                                # sad
                e = jnp.abs(a - b)
            # padded F sublanes hold zeros -> contribute 0 to every family
            out_ref[rr, di] = jnp.sum(e, axis=0)
        for di in range(len(shifts), Dp):
            out_ref[rr, di] = jnp.zeros((Wp,), jnp.float32)


def fused_fv_cost_volume(kernel: str, source_fv: jnp.ndarray,
                         target_fv: jnp.ndarray, shifts,
                         cv_dtype=jnp.float32, layout: str = "hwd",
                         rc: int = 4, interpret: bool | None = None):
    """cost[i, j, d] = compare(source[i, j, :], target[i, j + shifts[d], :])
    with zero target features out of range (`cross_correlations.h:204-236`
    zero-padding semantics).  ``shifts`` must be a static int sequence.
    Returns (H, W, D) for layout='hwd' or (H, D, W) for 'dhw'."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W, F = source_fv.shape
    D = len(shifts)
    shifts = tuple(int(s) for s in shifts)
    pad_l = max(0, -min(shifts))
    pad_r = max(0, max(shifts))

    Fp = _round_up(F, 8)
    Wp = _round_up(W, 128)
    Dp = _round_up(D, 8)
    Hp = _round_up(H, rc)
    # every static slice [pad_l+shift, pad_l+shift+Wp) must stay in range
    Wtp = _round_up(pad_l + Wp + pad_r, 128)

    def prep(fv, extra_l, total_w):
        x = jnp.moveaxis(fv.astype(jnp.float32), -1, 1)     # (H, F, W)
        return jnp.pad(x, ((0, Hp - H), (0, Fp - F),
                           (extra_l, total_w - extra_l - W)))

    src = prep(source_fv, 0, Wp)
    tgt = prep(target_fv, pad_l, Wtp)

    spec_s = pl.BlockSpec((rc, Fp, Wp), lambda h: (h, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_t = pl.BlockSpec((rc, Fp, Wtp), lambda h: (h, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((rc, Dp, Wp), lambda h: (h, 0, 0),
                          memory_space=pltpu.VMEM)
    kfn = functools.partial(_fv_kernel, RC=rc, F=F, Dp=Dp, Wp=Wp,
                            kernel=kernel, shifts=shifts, pad_l=pad_l)
    cv = pl.pallas_call(
        kfn, grid=(Hp // rc,), in_specs=[spec_s, spec_t], out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((Hp, Dp, Wp), jnp.float32),
        interpret=interpret)(src, tgt)
    cv = cv[:H, :D, :W].astype(cv_dtype)
    if layout == "dhw":
        return cv
    return jnp.moveaxis(cv, 1, -1)
