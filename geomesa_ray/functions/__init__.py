from geomesa_ray.functions.registry import FUNCTIONS, call

__all__ = ["FUNCTIONS", "call"]
