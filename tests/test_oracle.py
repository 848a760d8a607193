"""Every registered query with an oracle must match DuckDB on the same
parquet tables — the engine-side replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

from plan_spark.registry import load_all
from tests.conftest import SF_DIR, compare

SPECS = sorted(load_all().values(), key=lambda s: s.name)


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle(spark, ddb, spec):
    df = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        # rows-only check for non-SQL-expressible operators
        n = df.count()
        assert n >= 0
        return
    want = ddb.execute(spec.oracle).df()
    compare(df, want, name=spec.name)
