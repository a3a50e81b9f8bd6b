"""Replicates the driver's correctness gate locally: every queries() entry is
run on Spark and its oracle_sql() on DuckDB over the same parquet tables, and
compared exactly (row count, column names, order-insensitive values).

Runs at sf0.001 for speed (the driver uses sf0.01; tests/test_contract_sf001
semantics are identical, just smaller).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return v


def _rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


ALL = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    if sql is None:
        assert len(srows) >= 0  # rows-only check, mirrors the driver
        return
    ocols = [d[0] for d in ddb.execute(sql).description]
    orows = ddb.execute(sql).fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch"
    assert len(srows) == len(orows), (
        f"{name}: row count {len(srows)} (spark) vs {len(orows)} (oracle)"
    )
    sms = _rows_to_multiset(scols, [tuple(r) for r in srows])
    oms = _rows_to_multiset(ocols, orows)
    mismatches = [
        (a, b) for a, b in zip(sms, oms) if a != b
    ]
    assert sms == oms, f"{name}: first diffs {mismatches[:3]}"


def test_matrix_size_and_priority_order():
    """The driver executes a bounded prefix of the registration order (r01:
    40 rows, r02: first 50 of 54 — VERDICT r02). Pin the r3 contract:
    exactly 50 registered entries, every one oracled, and the historically
    never-gated queries registered first so no entry can fall outside the
    executed prefix."""
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert len(qs) == 50, len(qs)
    assert set(qs) == set(os_)
    assert list(qs)[:5] == [
        "token_count",
        "doc_fingerprint",
        "multimodal_meta",
        "engine_hits_diff",
        "language_report",
    ]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns == ["doc_id", "ocr", "n_pages", "ht_page_feature"]
    assert len(rows) > 0
