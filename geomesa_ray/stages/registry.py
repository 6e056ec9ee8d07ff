"""Pipeline-step registry — the engine's user-extension surface.

Parity target: the reference's SPI hooks (SURVEY §2.11 — converter
function factories, custom index factories via ``IndexKeySpaceFactory``,
``QueryInterceptor``, ``StrategyDecider`` overrides). Here the extension
points are plain registries:

- ``STAGES``: name -> stage factory. A factory returns either a batch
  function or a callable class + kwargs for ``map_batches``; `apply`
  wires it onto a Dataset. Users register their own with ``register``.
- cell encoders: ``AssignCells(scheme=...)`` dispatches "zcell" | "s2";
  new schemes register via ``CELL_SCHEMES``.
- join strategy: ``spatial_join(broadcast_threshold=...)`` is the
  pluggable chooser (pass a large/small threshold to force a strategy).
- scalar functions: ``geomesa_ray.functions.FUNCTIONS`` (same pattern).
"""

from __future__ import annotations

from typing import Any, Callable

STAGES: dict[str, Callable[..., Any]] = {}


def register(name: str):
    """Decorator: register a stage factory under ``name``."""

    def deco(factory):
        STAGES[name] = factory
        return factory

    return deco


def apply(ds, name: str, **kwargs):
    """Instantiate a registered stage and apply it to the Dataset."""
    if name not in STAGES:
        raise KeyError(f"unknown stage {name!r}; registered: {sorted(STAGES)}")
    return STAGES[name](ds, **kwargs)


# ---- built-ins ------------------------------------------------------------


@register("extract_geometry")
def _extract(ds, **kw):
    from geomesa_ray.stages.extract import extract_geometry

    return ds.map_batches(
        lambda t, kw_=kw: extract_geometry(t, **kw_), batch_format="pyarrow"
    )


@register("assign_cells")
def _assign(ds, **kw):
    from geomesa_ray.stages.assign import AssignCells

    return ds.map_batches(AssignCells(**kw), batch_format="pyarrow")


@register("spatial_join")
def _join(ds, polygons=None, **kw):
    from geomesa_ray.stages.pip_join import spatial_join

    return spatial_join(ds, polygons, **kw)


@register("density")
def _density(ds, **kw):
    from geomesa_ray.stages.density import density_grid

    return density_grid(ds, **kw)


@register("text_stats")
def _text(ds, **kw):
    from geomesa_ray.stages.text import text_stats

    return text_stats(ds, **kw)


@register("fingerprint")
def _fingerprint(ds, **kw):
    from geomesa_ray.stages.text import fingerprint

    return fingerprint(ds, **kw)


@register("expr_column")
def _expr_column(ds, col=None, expr=None):
    from geomesa_ray.functions.exprs import add_expr_column

    return add_expr_column(ds, col, expr)


@register("expr_filter")
def _expr_filter(ds, expr=None):
    from geomesa_ray.functions.exprs import filter_expr

    return filter_expr(ds, expr)


CELL_SCHEMES = ("zcell", "s2")


def build_pipeline(ds, steps: list[tuple[str, dict]]):
    """Config-driven pipeline: [(stage_name, kwargs), ...] — the analog of a
    converter/HOCON pipeline definition."""
    for name, kwargs in steps:
        ds = apply(ds, name, **kwargs)
    return ds
