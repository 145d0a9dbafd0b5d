"""Camera models (GeometricCamera replacement, SURVEY.md §2.1 CameraModels)."""
from .models import (
    FISHEYE_KB8,
    PINHOLE,
    Camera,
    in_image,
    project,
    project_jac,
    project_np,
    unproject,
    unproject_np,
)

__all__ = [
    "Camera",
    "PINHOLE",
    "FISHEYE_KB8",
    "project",
    "unproject",
    "project_np",
    "unproject_np",
    "project_jac",
    "in_image",
]
