"""Visibility-expression evaluator (geomesa-security VisibilityEvaluator
semantics: & over |, parens, quoted tokens, empty=public)."""

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.stages.visibility import (
    VisibilityError,
    VisibilityFilter,
    _evaluate,
    _parse,
)


def ev(expr: str, *auths: str) -> bool:
    return _evaluate(_parse(expr), frozenset(auths))


class TestParserSemantics:
    def test_single_token(self):
        assert ev("admin", "admin")
        assert not ev("admin", "user")

    def test_and_or(self):
        assert ev("user&geo", "user", "geo")
        assert not ev("user&geo", "user")
        assert ev("user|admin", "user")
        assert not ev("user|admin", "geo")

    def test_and_binds_tighter_than_or(self):
        # reference doc: user|admin&test == user|(admin&test)
        assert ev("user|admin&test", "user")
        assert not ev("user|admin&test", "admin")
        assert ev("user|admin&test", "admin", "test")
        # and user&admin|test == (user&admin)|test
        assert ev("user&admin|test", "test")
        assert not ev("user&admin|test", "user")

    def test_parens(self):
        assert ev("(admin|user)&geo", "user", "geo")
        assert not ev("(admin|user)&geo", "user")
        assert ev("((a))", "a")

    def test_quoted_tokens(self):
        assert ev('"ops team"', "ops team")
        assert not ev('"ops team"', "ops")
        assert ev('"ops team"&user', "ops team", "user")
        # java-style escapes inside quotes
        assert ev('"a\\"b"', 'a"b')
        assert ev('"a\\\\b"', "a\\b")

    def test_token_charset(self):
        assert ev("a-b_c:d.e/f", "a-b_c:d.e/f")

    def test_malformed(self):
        for bad in ["a&", "|a", "(a", "a)", "", "a b", '"unterminated', "()"]:
            with pytest.raises(VisibilityError):
                _parse(bad)


class TestVectorizedMask:
    def test_mask_with_nulls_and_cache(self):
        vf = VisibilityFilter({"user", "geo"})
        t = pa.table(
            {
                "visibility": pa.array(
                    ["", "admin", "user|admin", None, "user&geo", "admin", ""],
                    type=pa.string(),
                )
            }
        )
        out = vf.mask(t)
        # empty and null are public; admin hidden; user clauses visible
        assert out.tolist() == [True, False, True, True, True, False, True]
        # parse cache holds one entry per distinct non-empty string
        assert set(vf._cache) == {"", "admin", "user|admin", "user&geo"}

    def test_all_null_column(self):
        vf = VisibilityFilter(set())
        t = pa.table({"visibility": pa.array([None, None], type=pa.string())})
        assert vf.mask(t).tolist() == [True, True]

    def test_residual_duck_type(self):
        # .mask(table) signature matches the query_indexed residual API
        vf = VisibilityFilter({"x"}, column="vis")
        t = pa.table({"vis": ["x", "y"], "v": [1, 2]})
        assert t.filter(pa.array(vf.mask(t))).column("v").to_pylist() == [1]


class TestDatasetStage:
    def test_filter_visible(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.visibility import filter_visible

        ds = rd.from_arrow(
            pa.table(
                {
                    "id": list(range(6)),
                    "visibility": [
                        "",
                        "admin",
                        "user|admin",
                        "user&geo",
                        "(admin|user)&geo",
                        '"ops team"&user',
                    ],
                }
            )
        )
        out = filter_visible(ds, {"user", "geo"}).to_pandas()
        assert sorted(out["id"].tolist()) == [0, 2, 3, 4]
