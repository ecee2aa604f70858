"""Every registered query must match its DuckDB oracle at sf0.001 —
a faster local version of the driver's sf0.01 correctness gate."""

from __future__ import annotations

import pytest

from dere_spark.queries import ORACLES, QUERIES
from tests.oracle_harness import compare, duckdb_conn


@pytest.fixture(scope="module")
def conn(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, conn, sf_dir, name):
    problems = compare(spark, conn, QUERIES[name], ORACLES[name], sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_every_query_has_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLES)
    # every registered query is oracle-checked since r2 (porter got a
    # recorded-stems fixture oracle); keep it that way
    assert not missing, f"queries missing oracles: {missing}"


def test_driver_window_is_curated():
    """The external driver caps its CORRECTNESS artifact at the first 50
    queries()` entries. The 50-slot window must be the explicit DRIVER_WINDOW
    (VERDICT r3 #1/#9): the 8 previously driver-unverified gates lead, the
    rotation is disjoint and total, and __spark_entry__ honors the order."""
    import importlib.util
    from pathlib import Path

    from dere_spark.queries import _PREV_ROTATED_OUT, DRIVER_WINDOW, ROTATED_OUT

    assert len(DRIVER_WINDOW) == 50
    assert set(DRIVER_WINDOW).isdisjoint(ROTATED_OUT)
    assert set(DRIVER_WINDOW) | set(ROTATED_OUT) == set(QUERIES)
    # The rotation invariant as CI (VERDICT r5 #1): a gate parked last round
    # must be in the window this round — no gate misses two consecutive
    # driver rounds.  Each rotation copies the outgoing ROTATED_OUT into
    # _PREV_ROTATED_OUT before writing the new one.
    assert set(ROTATED_OUT).isdisjoint(_PREV_ROTATED_OUT), (
        "a gate is parked two consecutive rounds: "
        f"{set(ROTATED_OUT) & set(_PREV_ROTATED_OUT)}"
    )
    assert set(_PREV_ROTATED_OUT) <= set(DRIVER_WINDOW)
    # r6 rotation: the 8 gates whose last driver row is CORRECTNESS_r04
    # lead; the 8 freshly verified in CORRECTNESS_r05 are parked one round,
    # plus 11 r05-green keepers parked to make room for the 11 new gates
    # (5 web + text_bigram_counts + decontam_hits + text_pii_stats +
    # text_repetition_stats + corpus_weighted_sample +
    # corpus_pack_shards; 69 registered - 50 slots = 19 parked per
    # round from r6 on)
    # r7 rotation: the 19 gates parked in r6 lead slots 1-19 for fresh
    # CORRECTNESS_r07 rows
    assert DRIVER_WINDOW[:19] == (
        "doc_lang_dist", "join_full_outer_orders", "agg_pricing_summary",
        "set_union_distinct", "set_intersect_except", "regex_class_rewrite",
        "window_rank_kinds", "events_json_extract",
        "treebank_punct_delta", "text_quality", "dedup_simhash",
        "text_fingerprint", "dedup_clusters_star", "text_token_stats",
        "kg_pred_rollup", "kg_between_tokens", "window_event_lag",
        "eval_dup_adjustment", "dedup_ngram_shingles",
    )
    assert ROTATED_OUT == (
        "sim_ivf_topk", "sim_kmeans_buckets", "sim_ivf_batch_topk",
        "graph_shortest_path", "graph_span_paths", "skew_salted_counts",
        "dedup_embedding_pairs", "text_bow_counts",
        "treebank_punct_tokens", "dedup_jaccard_verified", "dedup_clusters",
        "kg_tokens", "kg_gold_arc_join", "eval_prf", "corpus_split_stats",
        "sim_ivf_buckets", "text_porter_stems", "web_host_graph",
        "events_cube_counts",
    )

    spec = importlib.util.spec_from_file_location(
        "spark_entry", Path(__file__).resolve().parents[1] / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert list(mod.queries())[:50] == list(DRIVER_WINDOW)
    assert list(mod.oracle_sql())[:50] == list(DRIVER_WINDOW)
