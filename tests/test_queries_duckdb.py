"""Spark-vs-DuckDB oracle comparison for every sql-tagged operator.

Mimics the driver's correctness harness (row count + column names +
order-insensitive values) so CORRECTNESS_r{N}.json surprises are caught
here first.  Runs at sf0.001 for speed; the driver runs sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

REGISTRY = entrymod._registry()

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SQL_OPS = sorted(name for name, (fn, sql) in REGISTRY.items() if sql is not None)
ROWS_ONLY_OPS = sorted(name for name, (fn, sql) in REGISTRY.items() if sql is None)


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bool):
        return bool(v)
    return v


def _rows_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=repr,
    )


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SQL_OPS)
def test_operator_matches_duckdb(spark, sf_dir, ddb, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(row[c] for c in s_cols) for row in sdf.collect()]

    res = ddb.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    sv, dv = _rows_set(s_cols, s_rows), _rows_set(d_cols, d_rows)
    mismatches = [(a, b) for a, b in zip(sv, dv) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


from storm_focused_crawler_spark.plans.queries import DISPLACED_ORACLES


@pytest.mark.parametrize("name", sorted(DISPLACED_ORACLES))
def test_displaced_op_matches_duckdb(spark, sf_dir, ddb, name):
    """Ops displaced from the driver's 50-key sql window (the harness
    records the first 50 sql keys; trivial scan/projection shapes gave
    their slots to parse_crawl_delay and the r5 curation filters) stay
    DuckDB-verified HERE via the kept oracle strings — the compare is
    byte-identical to the driver's."""
    fn, sql = REGISTRY[name]
    assert sql is None, f"{name} is back in the window — drop it from DISPLACED_ORACLES"
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(row[c] for c in s_cols) for row in sdf.collect()]
    res = ddb.execute(DISPLACED_ORACLES[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert _rows_set(s_cols, s_rows) == _rows_set(d_cols, d_rows)


@pytest.mark.parametrize("name", ROWS_ONLY_OPS)
def test_rows_only_operator_runs(spark, sf_dir, name):
    """Rows-only ops: run, stable schema, deterministic across two runs."""
    fn, _ = REGISTRY[name]
    df1 = fn(spark, sf_dir)
    rows1 = sorted(map(repr, df1.collect()))
    df2 = fn(spark, sf_dir)
    rows2 = sorted(map(repr, df2.collect()))
    assert df1.columns == df2.columns
    if name not in ("agg_round_metrics",):  # partition layout ties to session
        assert rows1 == rows2, f"{name}: nondeterministic output"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.columns == ["tld", "n_scheduled", "avg_score", "sum_chars"]
