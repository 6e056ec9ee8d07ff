from geomesa_ray.stages.extract import extract_geometry
from geomesa_ray.stages.assign import AssignCells

__all__ = ["extract_geometry", "AssignCells"]
