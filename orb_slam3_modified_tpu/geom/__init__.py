"""Two-view geometry + triangulation (TwoViewReconstruction / GeometricTools
replacement, SURVEY.md §2.1)."""
from .triangulation import (
    depth_and_reproj_checks,
    projection_matrix,
    triangulate_dlt,
    triangulate_rays,
)
from .two_view import TwoViewResult, reconstruct_two_views

__all__ = [
    "triangulate_dlt",
    "triangulate_rays",
    "projection_matrix",
    "depth_and_reproj_checks",
    "reconstruct_two_views",
    "TwoViewResult",
]
