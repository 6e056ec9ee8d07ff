"""Scan introspection: per-operator task/row/wall metrics from ds.stats().

Parity target: GeoMesa ``IteratorStackCount`` (reference
geomesa-index-api/.../iterators/IteratorStackCount.scala) — a debugging
aggregator that reports how many iterator stacks (per-tablet scan
instances) served a query. The Ray Data analog is the per-operator task
count + timing the streaming executor already tracks; this module parses
``Dataset.stats()`` into a structured report so pipelines can assert on
their execution shape (task counts, per-stage wall time) the way the
reference asserts on stack counts.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass
class StageStats:
    name: str
    n_tasks: int | None
    wall_s: float | None


_STAGE_RE = re.compile(r"Operator (\d+) (\S+?): (?:executed in ([\d.]+)s|[^\n]*)")
_TASK_RE = re.compile(r"(\d+) tasks? executed")


def parse_stats(stats_text: str) -> list[StageStats]:
    """ds.stats() text -> ordered per-operator (name, n_tasks, wall_s)."""
    out: list[StageStats] = []
    blocks = re.split(r"\n(?=Operator \d+ )", stats_text)
    for b in blocks:
        m = _STAGE_RE.match(b.strip())
        if not m:
            continue
        name = m.group(2)
        wall = float(m.group(3)) if m.group(3) else None
        tm = _TASK_RE.search(b)
        n_tasks = int(tm.group(1)) if tm else None
        out.append(StageStats(name=name, n_tasks=n_tasks, wall_s=wall))
    return out


def stack_count(ds) -> dict:
    """IteratorStackCount analog for an EXECUTED dataset: total tasks across
    operators + the per-operator breakdown."""
    stages = parse_stats(ds.stats())
    total = sum(s.n_tasks or 0 for s in stages)
    return {"total_tasks": total,
            "stages": [(s.name, s.n_tasks, s.wall_s) for s in stages]}
