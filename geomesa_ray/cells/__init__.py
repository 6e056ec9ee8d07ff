from geomesa_ray.cells.zcell import ZCellGrid
from geomesa_ray.cells.s2 import S2CellId
from geomesa_ray.cells.shard import shard_of

__all__ = ["ZCellGrid", "S2CellId", "shard_of"]
