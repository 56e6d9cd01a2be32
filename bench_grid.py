"""Secondary benchmark grid: the reference's SGM benchmark configurations
(`test/benchmarks/benchmarkCrossCorrelationAlgorithms.cpp:290-293,370-401`:
~SD image with D in {20, 160, 300}; HD with D = 320) plus the PatchMatch
and hierarchical configs of `benchmarkStereoMatchingModels.cpp`.

Prints one JSON line per configuration (device-chained timing).
"""

import json
import os
import time

# Raise the scoped-VMEM pool (utils/vmem.py): re-opens the configurations
# the 16 MB default forces down at HD / large D (resident CV, rc=8 row
# chunks, unsplit up pass, single-chunk WTA) — HD D=320 35.5 -> 31.5 ms,
# SD D=300 bf16 10.4 -> 8.9 ms, f32 14.4 -> 11.1 ms measured; flagship
# SD D=120 compiles to the identical configuration either way.  Must be
# set before the first jax device use.
os.environ.setdefault("LIBTPU_INIT_ARGS",
                      "--xla_tpu_scoped_vmem_limit_kib=65536")

import numpy as np


def _timed(fn, args, n=40):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(l, r, k):
        def body(_, lc):
            out = fn(lc, r)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return lc + 1e-12 * leaf.astype(jnp.float32).ravel()[0]
        return jax.lax.fori_loop(0, k, body, l)

    l, r = args
    np.asarray(chained(l, r, 1).ravel()[0])

    def timed_call(k):
        t0 = time.perf_counter()
        np.asarray(chained(l, r, k).ravel()[0])
        return time.perf_counter() - t0

    # tunnel round-trip noise can exceed a sub-ms op AND occasionally
    # spike a single call by milliseconds; a per-sample (long - short)
    # difference turns one spiked short-call into a negative (or 2x)
    # sample.  DIFFERENCE OF MEDIANS instead: median the 1-iter and
    # (1+n)-iter call times separately (each median is spike-robust),
    # then subtract — same number of device calls as the old
    # median-of-differences, but a single spike can no longer produce
    # a 0.0 ms or doubled row.
    import statistics
    t1s = [timed_call(1) for _ in range(5)]
    tns = [timed_call(1 + n) for _ in range(5)]
    return max((statistics.median(tns) - statistics.median(t1s)) / n,
               1e-6)


def main():
    import jax
    import jax.numpy as jnp
    from libstevi_tpu.core import MatchingFunction
    from libstevi_tpu.core.search import SearchOffset1
    from libstevi_tpu.ops import unfold_based_cost_volume
    from libstevi_tpu.ops.patchmatch import patch_match
    from libstevi_tpu.ops.hierarchical import hierarchical_truncated_cost_volume

    rng = np.random.default_rng(0)

    def pair(H, W):
        return (jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32)),
                jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32)))

    def sgm_cfg(H, W, D):
        # the reference's standard D-sweep rows ride the PRODUCTION path
        # (`ops.dense_sgm_stereo`: native-layout fused CV, Pout baking,
        # fused WTA+subpixel), in f32 — the semantic parity target of
        # the reference's float pipeline.  (Before round 5 these rows
        # measured the legacy composed scan-box + sgm_wta_truncated
        # chain, i.e. not what ships.)
        from libstevi_tpu.ops import dense_sgm_stereo, InterpolationKernel

        def fn(l, r):
            disp, _, _ = dense_sgm_stereo(
                MatchingFunction.ZNCC, l, r, 3, 3, D, P1=0.1, P2=0.5,
                n_directions=8,
                refine_kernel=InterpolationKernel.PARABOLA,
                cv_dtype=jnp.float32)
            return disp
        return fn

    def sgm_bf16_cfg(H, W, D):
        # the production fast path (ops.dense_sgm_stereo): native-layout
        # fused CV (banded at HD), Pout baking, fused WTA+subpixel
        from libstevi_tpu.ops import dense_sgm_stereo, InterpolationKernel

        def fn(l, r):
            disp, _, _ = dense_sgm_stereo(
                MatchingFunction.ZNCC, l, r, 3, 3, D, P1=0.1, P2=0.5,
                n_directions=8,
                refine_kernel=InterpolationKernel.PARABOLA,
                cv_dtype=jnp.bfloat16)
            return disp
        return fn

    # NOTE: dense HD D=320 in f32 materializes volume working sets beyond
    # one v5e's 16 GB HBM (measured round 1: 15.83/15.75 GB at compile).
    # The bf16 mode (parity bound: PARITY_r02.json, EPE p99 0.025 px vs
    # f32) halves every stream and fits —
    # `benchmarkCrossCorrelationAlgorithms.cpp:370-401`'s HD row runs
    # dense on ONE chip; f32 at that scale takes the row-sharded
    # distributed pipeline (parallel/) or the hierarchical matcher.
    def sgm16_cfg(H, W, D):
        # 16 directions stay f32 (knight masks break bf16 packed pairs);
        # the dense path bakes Pout via the multiplicity plane
        from libstevi_tpu.ops import dense_sgm_stereo, InterpolationKernel

        def fn(l, r):
            disp, _, _ = dense_sgm_stereo(
                MatchingFunction.ZNCC, l, r, 3, 3, D, P1=0.1, P2=0.5,
                n_directions=16,
                refine_kernel=InterpolationKernel.PARABOLA,
                cv_dtype=jnp.float32)
            return disp
        return fn

    def wta_cfg(func, D):
        # per-matching-function CV build + WTA (`benchmarkStereoMatching
        # Models.cpp:380-425`): non-dot families ride the fused
        # feature-volume aggregation
        from libstevi_tpu.core import MATCH_TRAITS
        from libstevi_tpu.ops import extract_selected_index

        def fn(l, r):
            cv = unfold_based_cost_volume(func, l, r, 3, 3, D)
            return extract_selected_index(cv, MATCH_TRAITS[func].strategy)
        return fn

    # the D-sweep runs BOTH precisions: f32 is the reference float
    # path's semantic parity target; bf16 is the TPU-native serving
    # configuration (committed parity bound PARITY_r02/r05)
    configs = [("SGM8 ZNCC SD D=20", 480, 640, sgm_cfg(480, 640, 20)),
               ("SGM8 ZNCC SD D=160", 480, 640, sgm_cfg(480, 640, 160)),
               ("SGM8 ZNCC SD D=300", 480, 640, sgm_cfg(480, 640, 300)),
               ("SGM8 ZNCC bf16 SD D=160", 480, 640,
                sgm_bf16_cfg(480, 640, 160)),
               ("SGM8 ZNCC bf16 SD D=300", 480, 640,
                sgm_bf16_cfg(480, 640, 300)),
               ("SGM8 ZNCC bf16 SD D=120", 480, 640,
                sgm_bf16_cfg(480, 640, 120)),
               ("SGM16 ZNCC SD D=120", 480, 640, sgm16_cfg(480, 640, 120)),
               ("SGM8 ZNCC bf16 dense HD D=320", 720, 1280,
                sgm_bf16_cfg(720, 1280, 320)),
               ("WTA SAD r=3 D=120", 480, 640,
                wta_cfg(MatchingFunction.SAD, 120)),
               ("WTA CENSUS r=3 D=120", 480, 640,
                wta_cfg(MatchingFunction.CENSUS, 120)),
               ("WTA ZSSD r=3 D=120", 480, 640,
                wta_cfg(MatchingFunction.ZSSD, 120)),
               ("WTA NCC r=3 D=120", 480, 640,
                wta_cfg(MatchingFunction.NCC, 120))]

    for name, H, W, fn in configs:
        dt = _timed(fn, pair(H, W))
        print(json.dumps({"metric": name, "value": round(1.0 / dt, 2),
                          "unit": "frames/s",
                          "ms": round(dt * 1e3, 2)}), flush=True)

    l, r = pair(480, 640)
    dt = _timed(lambda a, b: patch_match(
        MatchingFunction.NCC, a, b, SearchOffset1(0, 119), h_radius=3,
        v_radius=3, n_iter=5, n_random=4,
        key=jax.random.PRNGKey(0)).astype(jnp.float32), (l, r), n=5)
    print(json.dumps({"metric": "PatchMatch NCC r=3 D=120 5it",
                      "value": round(1.0 / dt, 2), "unit": "frames/s",
                      "ms": round(dt * 1e3, 2)}), flush=True)

    dt = _timed(lambda a, b: hierarchical_truncated_cost_volume(
        MatchingFunction.ZNCC, a, b, 3, 3, 120, depth=2
    ).disp_estimate.astype(jnp.float32), (l, r), n=5)
    print(json.dumps({"metric": "Hierarchical ZNCC depth-2 D=120",
                      "value": round(1.0 / dt, 2), "unit": "frames/s",
                      "ms": round(dt * 1e3, 2)}), flush=True)

    lh, rh = pair(720, 1280)
    dt = _timed(lambda a, b: hierarchical_truncated_cost_volume(
        MatchingFunction.ZNCC, a, b, 3, 3, 320, depth=3
    ).disp_estimate.astype(jnp.float32), (lh, rh), n=5)
    print(json.dumps({"metric": "Hierarchical ZNCC HD depth-3 D=320",
                      "value": round(1.0 / dt, 2), "unit": "frames/s",
                      "ms": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
