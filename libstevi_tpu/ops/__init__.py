from .unfold import unfold, PatchOrientation
from .census import census_features, census_transform_2d
from .matching import feature_comparison, compare_feature_volumes
from .cost_volume import (
    normalize_feature_volume,
    channels_mean,
    channels_norm,
    channels_zero_mean_norm,
    aggregate_cost,
    feature_volume_to_cost_volume,
    unfold_based_cost_volume,
    unfold_based_2d_disparity_cost_volume,
    extract_selected_index,
    extract_selected_2d_index,
    selected_index_to_disp,
    selected_2d_index_to_disp,
    selected_cost,
    truncated_cost_volume,
    truncated_bidirectional_cost_volume,
    extract_in_bound_domain,
)
from .sgm import sgm_cost_volume, sgm_wta_truncated, dense_sgm_stereo
from .image_refinement import (
    refine_barycentric_disp, refine_barycentric_symmetric_disp,
    refine_barycentric_2d_disp, refine_barycentric_symmetric_2d_disp,
    refine_cost_symmetric_disp,
    refine_subpart_barycentric_disp,
    refine_subpart_barycentric_symmetric_disp,
    refine_subpart_barycentric_2d_disp,
    refine_subpart_barycentric_symmetric_2d_disp,
    refine_arbitrary_interpolation_disp,
    refine_arbitrary_interpolation_2d_disp,
    refined_barycentric_symmetric_disp_fv, refined_barycentric_disp_fv,
    refined_cost_symmetric_disp_fv, refined_barycentric_2d_disp_fv,
    refined_barycentric_symmetric_2d_disp_fv,
    refined_barycentric_symmetric_disp, refined_barycentric_disp,
    refined_cost_symmetric_disp, refined_barycentric_2d_disp,
    refined_barycentric_symmetric_2d_disp)
from .refinement import (
    InterpolationKernel,
    refine_disp_cost_interpolation,
    refine_disp_2d_cost_interpolation,
    refine_disp_2d_cost_patch_interpolation,
)
from .filters import mean_filter_2d, sigma_filter, box_filter_2d

__all__ = [
    "unfold", "PatchOrientation",
    "census_features", "census_transform_2d",
    "feature_comparison", "compare_feature_volumes",
    "normalize_feature_volume", "channels_mean", "channels_norm",
    "channels_zero_mean_norm",
    "aggregate_cost", "feature_volume_to_cost_volume",
    "unfold_based_cost_volume", "unfold_based_2d_disparity_cost_volume",
    "extract_selected_index", "extract_selected_2d_index",
    "selected_index_to_disp", "selected_2d_index_to_disp", "selected_cost",
    "truncated_cost_volume", "truncated_bidirectional_cost_volume",
    "extract_in_bound_domain",
    "sgm_cost_volume",
    "sgm_wta_truncated",
    "dense_sgm_stereo",
    "InterpolationKernel", "refine_disp_cost_interpolation",
    "refine_disp_2d_cost_interpolation",
    "refine_disp_2d_cost_patch_interpolation",
    "mean_filter_2d", "sigma_filter", "box_filter_2d",
]
