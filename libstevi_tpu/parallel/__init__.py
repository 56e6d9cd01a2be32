from .mesh import make_stereo_mesh, MeshSpec
from .halo import halo_exchange_rows
from .stereo import (
    distributed_cost_volume_wta,
    distributed_dense_stereo_step,
    dshard_wta,
)
from .sgm_dist import distributed_sgm, distributed_sgm_fused

__all__ = [
    "make_stereo_mesh", "MeshSpec",
    "halo_exchange_rows",
    "distributed_cost_volume_wta", "distributed_dense_stereo_step",
    "dshard_wta", "distributed_sgm", "distributed_sgm_fused",
]
