"""Mimic the driver's correctness gate: run every queries() entry on Spark
and its oracle_sql() twin on DuckDB, compare order-insensitively."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by all values — order-insensitive."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def inventory():
    return entrymod.queries(), entrymod.oracle_sql()


# queries whose semantics are genuinely non-SQL-expressible (the driver
# records a rows-only check for those). Empty since round 6: even
# text_bpe_encode now carries a twin — the driver-learned word map rides
# into the DuckDB SQL as a VALUES table (merge TRAINING stays iterative
# driver code shared by both sides; what the gate checks is the
# distributed encode: tokenize → broadcast map join → per-doc aggregate,
# with ids_sum pinning the token-id content).
ROWS_ONLY: set[str] = set()


def test_oracle_keys_subset(inventory):
    q, o = inventory
    assert set(o).issubset(set(q))
    # every query outside the declared rows-only set carries an oracle twin
    assert set(q) - set(o) == ROWS_ONLY


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) >= 3
    assert "estimate" in pdf.columns


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(name, spark, duck, sf_dir, inventory):
    q, o = inventory
    if name in ROWS_ONLY:
        # driver-style weaker check: the query runs and yields rows
        assert len(q[name](spark, sf_dir).toPandas()) > 0
        return
    got = _canon(q[name](spark, sf_dir).toPandas())
    want = _canon(duck.execute(o[name]).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    n_exact = 0
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            av, bv = a.to_numpy(float), b.to_numpy(float)
            exact = np.array_equal(av, bv, equal_nan=True)
            if not exact:
                np.testing.assert_allclose(av, bv, rtol=1e-9, err_msg=f"{name}.{c}")
            else:
                n_exact += 1
        else:
            assert a.tolist() == b.tolist(), f"{name}.{c} mismatch"
            n_exact += 1
    # record how hash-friendly the query is (exact equality across engines)
    print(f"{name}: {n_exact}/{len(got.columns)} columns exactly equal")


def test_pipeline_facade_exports():
    from dbreg_spark import pipeline as P

    missing = [n for n in P.__all__ if not callable(getattr(P, n, None))]
    assert not missing, missing
    assert len(P.__all__) >= 40
