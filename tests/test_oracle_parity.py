"""Local replica of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() on DuckDB at sf0.01; compare row count, schema
shape, and an order-insensitive value hash (columns sorted by name, rows
sorted, values stringified with stable float formatting)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not available"
)


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return str(v)


def _canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    return out


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def contract():
    import __spark_entry__ as e

    return e


def _all_names():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    # every oracle key must have a query
    assert set(o) <= set(q)
    return sorted(q)


@pytest.mark.parametrize("name", _all_names())
def test_query_matches_oracle(name, spark, duck, contract):
    q = contract.queries()[name]
    oracles = contract.oracle_sql()
    sdf = q(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if name not in oracles:
        # weaker rows-only check (mirrors the driver)
        assert len(srows) >= 0
        return
    res = duck.execute(oracles[name])
    drows = res.fetchall()
    dcols = [d[0] for d in res.description]
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    assert sorted(scols) == sorted(dcols), f"{name}: cols {scols} vs {dcols}"
    s_can, d_can = _canon(srows, scols), _canon(drows, dcols)
    mismatches = [
        (a, b) for a, b in zip(s_can, d_can) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"


def test_entry_smoke(spark, contract):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"url", "keep", "quality_score", "scrubbed_text"} <= set(df.columns)
    kept = sum(1 for r in rows if r["keep"])
    assert 0 < kept <= len(rows)
