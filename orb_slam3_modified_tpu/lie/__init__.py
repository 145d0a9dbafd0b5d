"""Lie-group math: SO3 / SE3 / Sim3 — the Sophus replacement (SURVEY.md §2.2)."""
from . import so3, sim3
from .se3 import SE3, from_matrix
from .sim3 import Sim3
from . import se3

__all__ = ["so3", "se3", "sim3", "SE3", "Sim3", "from_matrix"]
