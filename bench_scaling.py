"""Multi-chip scaling benchmark: frames/s/chip and scaling efficiency of
the distributed dense-stereo step over 1..N devices (BASELINE.md: >= 80%
scaling efficiency at 2+ hosts; fps per chip at 1 chip / 1 host / N hosts).

Shards the BATCH axis (serving scale — one v5e chip already saturates on
a single SD frame, so data parallelism is the scaling dimension; the
row/disparity axes exist for >HBM frames and are exercised by
`dryrun_multichip` / tests/test_parallel.py).

On this environment only ONE physical TPU chip is reachable, so real
multi-chip numbers cannot be produced here: run on a pod slice to fill
the table.  With JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=8 it validates the harness
end-to-end on the virtual mesh (timings then measure host CPU, not ICI).

Prints one JSON line per device count:
  {"metric": "...", "n_devices": n, "value": fps_per_chip,
   "unit": "frames/s/chip", "efficiency": fps_n / (n * fps_1)}
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from libstevi_tpu.core import MatchingFunction
    from libstevi_tpu.parallel import make_stereo_mesh, MeshSpec
    from libstevi_tpu.parallel.stereo import distributed_dense_stereo_step

    devs = jax.devices()
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devs)]
    H, W, D = 480, 640, 120
    rng = np.random.default_rng(0)

    base_fps = None
    for n in counts:
        mesh = make_stereo_mesh(MeshSpec(batch=n, tile=1, dsh=1), devs[:n])
        step = distributed_dense_stereo_step(
            mesh, MatchingFunction.ZNCC, 3, 3, D, P1=0.1, P2=0.5,
            n_directions=8)
        B = 2 * n                       # 2 frames per chip per step
        ls = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
        rs = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
        out = step(ls, rs)
        np.asarray(out[0, 0, 0])        # compile + sync
        n_iter = 5
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = step(ls, rs)
        np.asarray(out[0, 0, 0])
        dt = (time.perf_counter() - t0) / n_iter
        fps_chip = B / dt / n
        if base_fps is None:
            base_fps = fps_chip
        print(json.dumps({
            "metric": f"distributed ZNCC+SGM8 {H}x{W} D={D} batch-sharded",
            "n_devices": n,
            "value": round(fps_chip, 2),
            "unit": "frames/s/chip",
            "efficiency": round(fps_chip / base_fps, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
