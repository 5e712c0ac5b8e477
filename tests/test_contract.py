"""Replicates the driver's correctness gate locally: every queries() entry
runs at sf0.01 and, where an oracle exists, must match DuckDB row-for-row
(order-insensitive)."""

import math
import os
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c] if isinstance(row, dict) else getattr(row, c)
            if isinstance(v, Decimal):
                v = float(v)
            if isinstance(v, float):
                v = 0.0 if (not math.isfinite(v)) else round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


ORACLE_NAMES = sorted(entry_mod.oracle_sql().keys())
ALL_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    cols = sorted(sdf.columns)
    got = _normalize([r.asDict() for r in sdf.collect()], cols)

    res = ddb.execute(entry_mod.oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    assert sorted(ocols) == cols, f"{name}: column mismatch {ocols} vs {sdf.columns}"
    want = _normalize([dict(zip(ocols, row)) for row in res.fetchall()], cols)

    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert got == want, f"{name}: value mismatch; first diff: " + str(
        next(((g, w) for g, w in zip(got, want) if g != w), None)
    )


@pytest.mark.parametrize(
    "name", [n for n in ALL_NAMES if n not in set(ORACLE_NAMES)]
)
def test_rows_only_queries_run(spark, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    assert sdf.count() >= 0  # runs, stable schema
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "doc_id" in df.columns and "score" in df.columns
