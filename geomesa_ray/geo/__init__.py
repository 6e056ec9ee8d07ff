from geomesa_ray.geo.wkt import parse_wkt, parse_points_wkt, format_point_wkt
from geomesa_ray.geo.predicates import Polygon, points_in_bbox
from geomesa_ray.geo.distance import haversine_m
from geomesa_ray.geo.gridsnap import GridSnap
from geomesa_ray.geo.bucketindex import PolygonBucketIndex

__all__ = [
    "parse_wkt",
    "parse_points_wkt",
    "format_point_wkt",
    "Polygon",
    "points_in_bbox",
    "haversine_m",
    "GridSnap",
    "PolygonBucketIndex",
]
