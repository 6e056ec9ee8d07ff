"""SQL-statement source (the JDBC converter analog on embedded DuckDB)."""

import duckdb
import pytest

from geomesa_ray.sources.sqlsrc import read_sql


@pytest.fixture()
def events_path(sf_small):
    return f"{sf_small}/events.parquet"


class TestReadSql:
    def test_sharded_statements_cover_table(self, ray_session, events_path):
        stmts = [
            f"SELECT event_id, user_id FROM events WHERE event_id % 3 = {i}"
            for i in range(3)
        ]
        out = read_sql(stmts, views={"events": events_path}).to_pandas()
        total = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{events_path}')"
        ).fetchone()[0]
        assert len(out) == total
        assert out["event_id"].is_unique

    def test_single_statement_and_expressions(self, ray_session, events_path):
        out = read_sql(
            "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type",
            views={"events": events_path},
        ).to_pandas()
        exp = duckdb.sql(
            f"SELECT event_type, count(*) AS n FROM read_parquet('{events_path}') "
            "GROUP BY event_type ORDER BY event_type"
        ).df()
        assert out["event_type"].tolist() == exp["event_type"].tolist()
        assert out["n"].tolist() == exp["n"].tolist()

    def test_duckdb_file_database(self, ray_session, tmp_path):
        db = str(tmp_path / "t.db")
        con = duckdb.connect(db)
        con.execute("CREATE TABLE kv AS SELECT range AS k, range * 2 AS v FROM range(10)")
        con.close()
        out = read_sql("SELECT k, v FROM kv WHERE k >= 5", database=db).to_pandas()
        assert sorted(out["k"].tolist()) == [5, 6, 7, 8, 9]
        assert (out["v"] == out["k"] * 2).all()
