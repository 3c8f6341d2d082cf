"""t1-equivalent smoke tests: entry() runs and every registered query
produces a schema-stable DataFrame at sf0.001."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_registry_nonempty():
    qs = entry_mod.queries()
    assert len(qs) >= 9
    oracles = entry_mod.oracle_sql()
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_runs_smoke(spark, name):
    fn = entry_mod.queries()[name]
    df = fn(spark, SF_SMOKE)
    assert df.columns  # schema resolvable
    df.limit(5).collect()  # executes


def test_duplicate_registration_raises():
    # A duplicate @query name must fail loudly at import time — plain dict
    # assignment silently shadowed ml_eval_calibration once (round 5).
    from spark_ml_helper_spark.registry import REGISTRY, query

    existing = next(iter(REGISTRY))
    original_fn = REGISTRY[existing].fn
    with pytest.raises(ValueError, match="duplicate query registration"):

        @query(existing)
        def _dup(spark, sf_dir):  # pragma: no cover
            raise AssertionError

    # the original registration is untouched
    assert REGISTRY[existing].fn is original_fn


def test_no_toplevel_redefinitions():
    # pyflakes-F811 semantics for module-level def/class names: a second
    # top-level ``def _helper`` silently shadows the first for every later
    # call site (round 6: a new ``_bpe_train`` at corpus.py:2222 broke the
    # r03-green tokenizer_bpe_train / corpus_apply_bpe). No linter ships in
    # the container, so enforce it here.
    import ast
    import pathlib

    pkg = pathlib.Path(entry_mod.__file__).parent / "spark_ml_helper_spark"
    offenders = []
    for path in sorted(pkg.rglob("*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        seen: dict[str, int] = {}
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                if node.name in seen:
                    offenders.append(
                        f"{path.relative_to(pkg.parent)}:{node.lineno} "
                        f"redefines {node.name!r} (first at line {seen[node.name]})"
                    )
                else:
                    seen[node.name] = node.lineno
    assert not offenders, "top-level redefinitions:\n" + "\n".join(offenders)
