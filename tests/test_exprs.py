"""Sandboxed expression UDFs (the ScriptingFunctionFactory analog)."""

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.functions.exprs import Expr, ExprError, add_expr_column, filter_expr


def t(**cols):
    return pa.table(cols)


class TestEvaluation:
    def test_arithmetic(self):
        e = Expr("a * 2 + b % 3")
        out = e(t(a=[1, 2, 3], b=[4, 5, 6]))
        assert out.tolist() == [3, 6, 6]

    def test_boolop_rewrite(self):
        e = Expr("(a > 1 and a < 3) or b == 0")
        out = e(t(a=[1, 2, 3], b=[0, 9, 9]))
        assert out.tolist() == [True, True, False]

    def test_chained_compare(self):
        assert Expr("0 < a < 3")(t(a=[0, 1, 2, 3])).tolist() == [False, True, True, False]

    def test_ifexp_becomes_where(self):
        out = Expr("a * 10 if a > 1 else -a")(t(a=[1, 2]))
        assert out.tolist() == [-1, 20]

    def test_not(self):
        assert Expr("not (a > 1)")(t(a=[1, 2])).tolist() == [True, False]

    def test_numpy_funcs(self):
        out = Expr("maximum(a, b) + abs(0 - 1)")(t(a=[1, 5], b=[3, 2]))
        assert out.tolist() == [4, 6]

    def test_registry_functions_callable(self):
        # converter registry functions participate (lowercase from FUNCTIONS)
        out = Expr("lowercase(s)")(t(s=["AbC", "XY"]))
        assert list(out) == ["abc", "xy"]

    def test_string_equality(self):
        assert Expr("s == 'x'")(t(s=["x", "y"])).tolist() == [True, False]

    def test_columns_property(self):
        assert Expr("a + maximum(b, 1)").columns == ["a", "b"]

    def test_missing_column(self):
        with pytest.raises(ExprError, match="missing"):
            Expr("nope + 1")(t(a=[1]))


class TestSandbox:
    @pytest.mark.parametrize("bad", [
        "__import__('os')",
        "().__class__",
        "a.__dict__",
        "[x for x in a]",
        "lambda: 1",
        "a[0]",
        "f'{a}'",
        "exec('x')",            # unknown function name
        "a; b",                 # statements
        "open('/etc/passwd')",  # unknown function name
    ])
    def test_rejected(self, bad):
        with pytest.raises(ExprError):
            Expr(bad)

    def test_no_builtins_leak(self):
        with pytest.raises(ExprError):
            Expr("getattr(a, 'x')")


class TestDatasetStages:
    def test_add_and_filter(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(t(a=[1.0, 150.0, 80.0], b=[1, 2, 3]))
        out = add_expr_column(ds, "score", "a * 0.5 if a > 100 else a + b").to_pandas()
        assert out["score"].tolist() == [2.0, 75.0, 83.0]
        kept = filter_expr(ds, "a >= 80 and b != 2").to_pandas()
        assert kept["a"].tolist() == [80.0]

    def test_registered_stage(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.registry import build_pipeline

        ds = rd.from_arrow(t(a=[1, 2, 3]))
        out = build_pipeline(ds, [
            ("expr_column", {"col": "sq", "expr": "a * a"}),
            ("expr_filter", {"expr": "sq > 1"}),
        ]).to_pandas()
        assert out["sq"].tolist() == [4, 9]
