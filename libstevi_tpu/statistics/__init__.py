from .stereo_covering import compute_covering, compute_covering_proportion
from .covariance_kernels import matern_kernel, exponential_kernel, gaussian_kernel

__all__ = ["compute_covering", "compute_covering_proportion",
           "matern_kernel", "exponential_kernel", "gaussian_kernel"]
