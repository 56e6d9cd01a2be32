"""libstevi_tpu — a TPU-native stereo / 3D computer-vision engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
french-paragon/LibStevi (reference: C++17 header templates + OpenMP).
The compute path is functional JAX (jit/vmap/scan + Pallas kernels);
distribution is `jax.sharding.Mesh` + `shard_map` with ICI collectives
(halo exchange for window margins and SGM scanline carries, disparity-range
sharding with argmin reduction) — a layer the reference does not have.

Layer map (mirrors SURVEY.md §1, re-expressed TPU-first):
    core/           dtypes, enums, margins, RNG           (utils/ in reference)
    ops/            cost-volume engine: unfold, census, matching costs,
                    aggregation, WTA, SGM, refinement, patchmatch,
                    hierarchical                          (correlation/)
    geometry/       rotations, projection, lens distortion, alignment,
                    rectification, BSP/BVH                (geometry/)
    optim/          L0/L1/L2/LMedS/spherical solvers, Gauss-Newton,
                    RANSAC, BFGS, assignment, PCA         (optimization/)
    imageproc/      convolutions, filters, morphology, color, histogram,
                    connected components, inpainting, ... (imageProcessing/)
    sparse/         Harris/FAST corners, descriptors      (sparseMatching/)
    graphs/         graph, max-flow/min-cut               (graphs/)
    interpolation/  kernel interpolation, downsampling    (interpolation/)
    statistics/     stereo covering, covariance kernels   (statistics/)
    io/             image + point-cloud codecs            (io/)
    parallel/       mesh, halo exchange, distributed SGM/CV (new; no
                    reference counterpart — replaces OpenMP as substrate)
    pipelines/      end-to-end dense/sparse stereo pipelines
"""

__version__ = "0.1.0"

from . import core  # noqa: F401
