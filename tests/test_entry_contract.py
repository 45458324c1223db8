"""Driver-contract mirror: run every ``queries()`` entry and compare it to
its ``oracle_sql()`` via DuckDB, the way the driver does (row count + column
names + order-insensitive values). Runs at sf0.001 for speed; the driver
repeats this at sf0.01.

Opt-in BIG SWEEP (the round-3 item 7 routine): set ``GRAFT_ORACLE_SF=0.1``
(or 0.01) to run the whole module against that fixture instead —

    GRAFT_ORACLE_SF=0.1 python -m pytest tests/test_entry_contract.py -q

This is how the half-ulp linear-rounding divergence was caught at sf0.1;
run it once per round (takes a few minutes) and record the result in
BASELINE.md."""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

ORACLE_SF = float(os.environ.get("GRAFT_ORACLE_SF", "0.001"))
SF_DIR = f"/root/testdata/sf{ORACLE_SF:g}"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module", autouse=True)
def small_oracle_sf(ray_session):
    old = entrymod.SF_FOR_ORACLE
    entrymod.SF_FOR_ORACLE = ORACLE_SF
    yield
    entrymod.SF_FOR_ORACLE = old


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    return pd.DataFrame(result)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(con, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got_raw = to_pandas(q(SF_DIR))
    want_raw = con.sql(sql).df()
    got = normalize(got_raw)
    want = normalize(want_raw)
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    # the driver hashes raw values, so representation (int width / float vs
    # int) must match too — DuckDB SUM(int32)→HUGEINT or MIN(int32)→int32
    # would silently diverge from the engine's int64 output
    for c in got.columns:
        ga, wa = got_raw[c].dtype, want_raw[c].dtype
        assert ga == wa, f"{name}.{c}: engine dtype {ga} != oracle dtype {wa}"
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-9, err_msg=f"{name}.{c}")
        else:
            if not np.array_equal(a, b):
                diff = np.flatnonzero(a != b)[:5]
                raise AssertionError(f"{name}.{c} mismatch at {diff}: {a[diff]} vs {b[diff]}")


NO_ORACLE = sorted(set(entrymod.queries().keys()) - set(ORACLE_KEYS))


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_queries_run(name):
    q = entrymod.queries()[name]
    df = to_pandas(q(SF_DIR))
    assert len(df) >= 0
    assert len(df.columns) > 0


def test_entry_smoke():
    df = to_pandas(entrymod.entry())
    assert len(df) > 0
    assert {"source", "tier", "bucket_ts", "count"} <= set(df.columns)
