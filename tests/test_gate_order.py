"""Pin the declaration-order prefix of __spark_entry__.queries().

The external verifier oracle-checks exactly the FIRST 50 queries in
declaration order.  Round 9 accidentally inserted two new gates mid-dict,
pushing two previously-verified gates (boot_score_gram, numeric_winsorize)
out of that window.  This test makes any future insertion fail loudly:
new gates must be APPENDED at the end of queries().

No Spark session is needed: queries() only builds a dict of closures.
"""

import importlib.util
import pathlib

_ENTRY = pathlib.Path(__file__).resolve().parents[1] / "__spark_entry__.py"

# The 50 names verified green in CORRECTNESS_r08.json, in declaration order.
PINNED_FIRST_50 = [
    "moments_nofe",
    "moments_weighted",
    "demean_moments_1fe_weighted",
    "compress_cells_weighted",
    "demean_moments_1fe",
    "demean_moments_2fe",
    "demean_moments_3fe_iter",
    "mundlak_moments_2fe",
    "compress_cells",
    "group_means_1fe",
    "meat_hc1_fixed_beta",
    "cluster_scores_fixed_beta",
    "cluster_scores_multiway",
    "moments_multi",
    "demean_moments_multi_1fe",
    "conley_meat_fixed_beta",
    "diag_bp_aux_moments",
    "diag_reset_aux_moments",
    "diag_jb_aux_moments",
    "diag_bg_aux_moments",
    "diag_bp_within_aux_moments",
    "diag_wooldridge_fd_moments",
    "meat_hc3_fixed_beta",
    "glm_irls_step_logit",
    "glm_irls_step_negbin",
    "glm_fepois_profile_step",
    "glm_split_fepois_step",
    "glm_kfe_cells",
    "iv_gram_2sls",
    "iv_coef_simple",
    "iv_coef_demean_1fe",
    "design_matrix_interactions",
    "probe_compression",
    "probe_balance",
    "probe_nested_fe",
    "bin_geometry_manual",
    "ntile_bins",
    "binscatter_deg0_manual",
    "binscatter_glm_manual",
    "text_stats",
    "text_fingerprints",
    "eval_classifier_metrics",
    "eval_calibration",
    "eval_regression_metrics",
    "text_bpe_wordfreq",
    "text_bpe_encode",
    "moments_split",
    "boot_cluster_gram",
    "boot_score_gram",
    "numeric_winsorize",
]


def _load_entry():
    spec = importlib.util.spec_from_file_location("__spark_entry__", _ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_first_50_prefix_is_pinned():
    # NOTE: only queries() is exercised here (a dict of closures, no Spark
    # jobs). oracle_sql() is deliberately NOT called: building the oracles
    # runs Spark jobs and re-registers the shared session's temp views at
    # the gate SF dir, poisoning later tests. check_gates.py already pins
    # queries()/oracle_sql() key equality.
    entry = _load_entry()
    declared = list(entry.queries().keys())
    assert declared[:50] == PINNED_FIRST_50, (
        "queries() declaration-order prefix changed. The external verifier "
        "oracle-checks the FIRST 50 declared queries; inserting a new gate "
        "mid-dict silently drops a verified gate from its window. Append "
        "new gates at the END of queries() instead."
    )
