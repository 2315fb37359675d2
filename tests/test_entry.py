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


def test_oracle_keys_subset(inventory):
    q, o = inventory
    assert set(o).issubset(set(q))
    # every query now carries an oracle twin (the decode stub's md5-integer
    # PRNG made the last rows-only gate hash-matched, VERDICT r03 #7)
    assert set(q) - set(o) == set()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) >= 3
    assert "estimate" in pdf.columns


@pytest.mark.parametrize(
    "name",
    [
        "moments_nofe",
        "demean_moments_1fe",
        "demean_moments_2fe",
        "demean_moments_3fe_iter",
        "mundlak_moments_2fe",
        "compress_cells",
        "group_means_1fe",
        "meat_hc1_fixed_beta",
        "cluster_scores_fixed_beta",
        "cluster_scores_multiway",
        "design_matrix_interactions",
        "probe_compression",
        "probe_balance",
        "probe_nested_fe",
        "bin_geometry_manual",
        "ntile_bins",
        "binscatter_deg0_manual",
        "text_stats",
        "text_fingerprints",
        "dedup_exact",
        "dedup_minhash_signatures",
        "dedup_minhash_lsh_pairs",
        "dedup_components",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "multimodal_decode_features",
        "sampling_hash_split",
        "sampling_stratified",
        "text_pack_greedy",
        "events_asof_join",
        "events_interval_join",
        "text_vocabulary",
        "embedding_quantize_int8",
        "similarity_cosine_topk",
        "similarity_hyperplane_lsh",
        "similarity_ivf_topk",
        "dedup_embedding_neardup",
        "multimodal_metadata",
        "multimodal_frame_plan",
        "ols_coef_simple",
        "ols_coef_demean_1fe",
        "predict_demean_1fe",
        "predict_compress_fe",
        "events_window_daily",
        "events_sessionize_batch",
        "events_moments_daily",
    ],
)
def test_query_matches_oracle(name, spark, duck, sf_dir, inventory):
    q, o = inventory
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
