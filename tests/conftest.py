"""Shared pytest fixtures + the DuckDB-oracle comparison harness.

Mirrors the reference's duckdb-vs-plan golden layout
(/root/reference/cases/tpch/1g/{duckdb,plan}/) and the driver's compare:
row count + schema + order-insensitive value comparison with columns sorted
by name.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from plan_spark.catalog import TABLES
from plan_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("plan_spark-tests")
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize a result frame: columns sorted by name, rows sorted by
    every column, timestamps normalized to ns, NaN normalized to None for
    object columns."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str)).reset_index(
            drop=True
        )
    return df


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    """Assert a Spark result matches the oracle frame (order-insensitive)."""
    got = canon(spark_df.toPandas())
    want = canon(oracle_pdf)
    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) and pd.api.types.is_float_dtype(w):
            eq = (g.isna() & w.isna()) | (g == w)
            if not eq.all():
                bad = (~eq).idxmax()
                raise AssertionError(
                    f"{name}.{c}: float mismatch at row {bad}: {g[bad]!r} != {w[bad]!r} "
                    f"(maxdiff={((g - w).abs()).max()})"
                )
        else:
            gs, ws = g.astype(str), w.astype(str)
            eq = gs == ws
            if not eq.all():
                bad = (~eq).idxmax()
                raise AssertionError(
                    f"{name}.{c}: mismatch at row {bad}: {g[bad]!r} != {w[bad]!r}"
                )
