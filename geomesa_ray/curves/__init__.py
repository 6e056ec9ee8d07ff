from geomesa_ray.curves.normalize import BitNormalizedDimension
from geomesa_ray.curves.z2 import Z2SFC
from geomesa_ray.curves.z3 import Z3SFC
from geomesa_ray.curves.binnedtime import BinnedTime
from geomesa_ray.curves.xz2 import XZ2SFC

__all__ = ["BitNormalizedDimension", "Z2SFC", "Z3SFC", "BinnedTime", "XZ2SFC"]
