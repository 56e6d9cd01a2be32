"""Round-5 exp B: fused CV builder variants, interleaved in one window.

  - VPU kernel at Hb 48 (production pick: the scope estimator rejects
    96 by 536 bytes) / 96 / 240  — is the picker leaving halo-overlap
    waste on the table?  (V-window overcompute is (Hb+16)/Hb.)
  - MXU-V: vertical window as banded 0/1 matmul (f32 dot -> bf16x3
    multi-pass) at Hb 96 / 240  — round-4 measured 0.787 vs 0.865.
  - MXU-V-split: hs split hi/lo bf16, two full-rate bf16 matmuls with
    f32 accumulate (~2^-16 relative on the window sum, vs the
    cancellation-sensitive zcc this is ~1 bf16 ulp of the output).
  - mask-hoist micro-opt on the VPU kernel (k-independent selects
    hoisted out of the d loop).

All variants emit the production-padded (negate + pout_bake + inf-d-pad)
bf16 volume and are value-checked against the production builder.

Run: python -u scripts/exp_r5_cv.py
"""
import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libstevi_tpu.ops import box_pallas as bp
from libstevi_tpu.utils.profiling import device_timer

H, W, D, Dp = 480, 640, 120, 128
DC = 8
Hp, Wp = 480, 640
Wpp = Wp + Dp + DC
pr = bp._PADROWS
dt = jnp.bfloat16

rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))


def _kernel_v2(src_ref, tgtp_ref, stats_ref, *refs, Hb, mode, n):
    """Variant kernel: mode in {'vpu', 'vpu_hoist', 'mxu', 'mxu_split'}.
    Emits the production-padded bf16 ZNCC volume (negate, pout=100,
    inf-d-pad)."""
    if mode in ("mxu", "mxu_split"):
        bv_ref, out_ref, scr_ref = refs
    else:
        out_ref, scr_ref = refs
    hb = pl.program_id(0)
    d_idx = pl.program_id(1)
    d0 = d_idx * DC
    Hx = Hb + 2 * pr
    r0 = hb * Hb

    @pl.when(d_idx == 0)
    def _():
        scr_ref[...] = tgtp_ref[:, pl.ds(r0, Hx), :]

    src = src_ref[pl.ds(r0, Hx), :]
    sum_s = stats_ref[0, pl.ds(r0, Hx), :]
    den_s = stats_ref[1, pl.ds(r0, Hx), :]
    tgt_b = scr_ref[...]

    jj = jax.lax.broadcasted_iota(jnp.int32, (Hb, Wp), 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (Hb, Wp), 0) + r0
    c = slice(pr, pr + Hb)
    infpat = jnp.where((ii < H) & (jj < W), jnp.float32(jnp.inf), 0.0)
    hoist = mode in ("vpu_hoist", "mxu", "mxu_split")
    if hoist:
        pout_or_zero = jnp.where(jj < W, jnp.float32(100.0), 0.0)
        row_ok = ii < H
    for k in range(DC):
        t_d = jax.lax.slice_in_dim(tgt_b[0], k, k + Wp, axis=1)
        p = src * t_d
        if mode in ("mxu", "mxu_split"):
            hs = bp._window_sum_lanes(p, 3)
            bv = bv_ref[...]
            if mode == "mxu":
                cross = jax.lax.dot_general(
                    bv, hs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                hi = hs.astype(jnp.bfloat16)
                lo = (hs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                bvb = bv.astype(jnp.bfloat16)
                cross = (jax.lax.dot_general(
                    bvb, hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                    bvb, lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
        else:
            cross = bp._window_sum_sublanes(
                bp._window_sum_lanes(p, 3), 3)[c]
        sum_t = jax.lax.slice_in_dim(tgt_b[1], k, k + Wp, axis=1)[c]
        zcc = cross - sum_s[c] * sum_t * (1.0 / n)
        cost = -(zcc * den_s[c]
                 * jax.lax.slice_in_dim(tgt_b[2], k, k + Wp, axis=1)[c])
        in_range = jj + (d0 + k) < W
        if hoist:
            val = jnp.where(in_range, cost, pout_or_zero)
            val = jnp.where(d0 + k < D, jnp.where(row_ok, val, 0.0),
                            infpat)
        else:
            val = jnp.where(in_range, cost,
                            jnp.where(jj < W, jnp.float32(100.0), 0.0))
            val = jnp.where(d0 + k < D, jnp.where(ii < H, val, 0.0),
                            infpat)
        out_ref[k] = val.astype(dt)
    zfill = jnp.zeros((3, Hx, DC), tgt_b.dtype)
    scr_ref[...] = jnp.concatenate([tgt_b[:, :, DC:], zfill], axis=2)


def make_cv(Hb, mode):
    def cv(l, r):
        srcp, tgt_stack, stats_s, n = bp._prep_inputs(
            "zncc", l, r, 3, 3, Hp, Wp, Wpp)
        Hx = Hb + 2 * pr
        kern = functools.partial(_kernel_v2, Hb=Hb, mode=mode, n=n)
        Hpp = Hp + 2 * pr
        in_specs = [pl.BlockSpec((Hpp, Wp), lambda h, d: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((3, Hpp, Wpp), lambda h, d: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, Hpp, Wp), lambda h, d: (0, 0, 0),
                                 memory_space=pltpu.VMEM)]
        args = [srcp, tgt_stack, stats_s]
        if mode in ("mxu", "mxu_split"):
            rows = np.arange(Hb)[:, None]
            cols = np.arange(Hx)[None, :]
            bv = jnp.asarray((np.abs(cols - (rows + pr)) <= 3)
                             .astype(np.float32))
            in_specs.append(pl.BlockSpec((Hb, Hx), lambda h, d: (0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(bv)
        return pl.pallas_call(
            kern, grid=(Hp // Hb, Dp // DC),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((DC, Hb, Wp), lambda h, d: (d, h, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Dp, Hp, Wp), dt),
            scratch_shapes=[pltpu.VMEM((3, Hx, Wpp), jnp.float32)],
            interpret=jax.default_backend() != "tpu")(*args)
    return cv


def prod(l, r):
    out = bp.box_cost_volume_fused_padded(
        bp.MatchingFunction.ZNCC, l, r, 3, 3, D, Dp, dt, negate=True,
        pout_bake=100.0, interpret=False)
    return jnp.moveaxis(out, 1, 0)     # back to (Dp, Hp, Wp)


VARIANTS = {"production (moveaxis back)": prod}
for Hb in (48, 96, 240):
    VARIANTS[f"vpu Hb={Hb}"] = make_cv(Hb, "vpu")
VARIANTS["vpu_hoist Hb=240"] = make_cv(240, "vpu_hoist")
for Hb in (96, 240):
    VARIANTS[f"mxu Hb={Hb}"] = make_cv(Hb, "mxu")
VARIANTS["mxu_split Hb=240"] = make_cv(240, "mxu_split")


def forced(fn):
    def g(l, r):
        o = fn(l, r).astype(jnp.float32)
        return jnp.where(jnp.isfinite(o), o, 0.0).sum().reshape(1)
    return g


names = sys.argv[1:] or list(VARIANTS)
ref = np.asarray(jax.jit(prod)(img_l, img_r), np.float32)
fin = np.isfinite(ref)
timers = {}
for nm in names:
    fn = VARIANTS[nm]
    got = np.asarray(jax.jit(fn)(img_l, img_r), np.float32)
    d = np.abs(ref[fin] - got[fin])
    print(f"[check] {nm:28s} max|diff| {float(d.max()):.3e} "
          f"frac_equal {float((d == 0).mean()):.4f}", flush=True)
    timers[nm] = device_timer(forced(fn), img_l, img_r)
    print(f"[compiled] {nm}", flush=True)

res = {nm: [] for nm in timers}
for rep in range(3):
    for nm, t_fn in timers.items():
        t = t_fn(iters=40) * 1e3
        res[nm].append(t)
        print(f"  rep{rep} {nm:28s} {t:7.3f} ms", flush=True)
print("\n=== medians ===")
for nm in timers:
    print(f"{nm:30s} {float(np.median(res[nm])):7.3f} ms")
