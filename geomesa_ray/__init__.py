"""geomesa_ray — a from-scratch Ray-Data-native spatial-join + tiling engine.

Reimplements the query/data-processing semantics of ccri/geomesa (the
reference at /root/reference) as idiomatic Ray Data pipelines:

- ``curves``   : Z2 / Z3 / XZ2 space-filling-curve kernels with GeoMesa-parity
                 bit semantics (vectorized numpy).
- ``cells``    : hierarchical cell encodings — Z-prefix quadtree cells and a
                 pure-numpy S2 cell-id implementation — plus coverings,
                 sharding/salting.
- ``geo``      : vectorized geometry kernels (WKT, point-in-polygon, distance,
                 grid snapping) with no native-geo dependencies.
- ``stages``   : Ray Data batch transforms / actor-pool stages (extract,
                 assign_cells, PIP joins, kNN, density, stats, dedup, text,
                 similarity).
- ``sources``  : deterministic interleaved-corpus synthesizer + IO helpers.
- ``pipelines``: query model (QuerySpec) and the flagship pipelines.
- ``state``    : checkpoint manifests, per-partition lineage + metrics.

Everything is built on public knowledge only: Ray Data / pyarrow APIs, the
reference repo's observable semantics, and published papers (XZ-ordering,
space-saving top-k, HyperLogLog, MinHash-LSH).
"""

__version__ = "0.1.0"
