"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in geomesa_ray) calls ray.init/ray.shutdown.

- ``entry()``     : flagship pipeline over /root/testdata/sf0.001 — derive
  geo points from events, assign cells/time bins, broadcast PIP join.
- ``queries()``   : operator registry (geomesa_ray.pipelines.queries), one
  callable per implemented operator from SURVEY.md §2 + the training-data
  extensions.
- ``oracle_sql()``: matching DuckDB SQL (identical column names; money as
  integer cents; geo derivations use IEEE-identical double arithmetic).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship: interleaved corpus -> extract -> assign -> spatial join
    (the north-star pipeline at smoke scale)."""
    from geomesa_ray.pipelines.queries import q_corpus_pip_join

    return q_corpus_pip_join("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from geomesa_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from geomesa_ray.pipelines.queries import ORACLES

    # The corpus_* and media_features oracles read the deterministic synth
    # corpus from /tmp; synthesize it NOW (pure pyarrow, idempotent, ~1 s)
    # so the SQL binds even if the driver parses/validates oracles before
    # running the paired query callables.
    try:
        from geomesa_ray.sources.synth import synthesize_corpus

        synthesize_corpus(5000, seed=42, n_shards=4)
    except Exception:
        pass  # queries synthesize on demand; binding just loses the head start

    return dict(ORACLES)
