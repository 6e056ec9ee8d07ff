"""SQL statement source -> Arrow (DuckDB embedded, no server).

Parity target: the reference's JDBC converter
(``geomesa-convert/geomesa-convert-jdbc/.../JdbcConverter.scala``): the
input is a sequence of SQL STATEMENTS, each executed against a connection,
with every result row becoming a feature. The container has no JDBC/server
database; DuckDB is the embedded analog (it reads its own .db files plus
parquet/csv directly).

Ray-first shape: ONE READ TASK PER STATEMENT — the statement list is the
partitioning (exactly how JDBC ingest scales: ``SELECT ... WHERE shard=0``,
``... WHERE shard=1``, ...). Each task opens its own connection (workers
share nothing), registers the requested views, and streams the result out
as Arrow. Schema consistency across statements is the caller's contract,
as in the reference.
"""

from __future__ import annotations

import pyarrow as pa


class _RunStatement:
    """Actor-pool stage: one DuckDB connection per actor (init-once), one
    statement per batch."""

    def __init__(self, database: str | None, views: dict[str, str] | None):
        import duckdb

        self.con = duckdb.connect(database or ":memory:", read_only=bool(database))
        for name, path in (views or {}).items():
            # CREATE VIEW can't be a prepared statement — inline the path
            # with single quotes escaped
            p = str(path).replace("'", "''")
            self.con.execute(
                f'CREATE OR REPLACE VIEW "{name}" AS SELECT * FROM read_parquet(\'{p}\')'
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for sql in batch.column("sql").to_pylist():
            outs.append(self.con.execute(sql).arrow())
        return pa.concat_tables(outs)


def read_sql(statements, database: str | None = None,
             views: dict[str, str] | None = None):
    """Ray Dataset from SQL statements.

    - ``statements``: one SQL string or a list (one read task each — supply
      shard-predicated statements to parallelize a big table).
    - ``database``: optional DuckDB file to open read-only.
    - ``views``: {name: parquet_path} registered before execution.
    """
    import ray.data as rd

    from geomesa_ray.util import default_concurrency

    if isinstance(statements, str):
        statements = [statements]
    items = rd.from_items([{"sql": s} for s in statements])
    return items.map_batches(
        _RunStatement,
        fn_constructor_kwargs=dict(database=database, views=views),
        batch_format="pyarrow",
        batch_size=1,
        concurrency=default_concurrency(),
    )
