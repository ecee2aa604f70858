"""Learned trigger tagger (operators/tagger.py + bionlp tagged path).

The tagger is the engine-native stand-in for the reference's CRF span
classifier (span_classifier.py:69-183): gazetteer-hit candidates from the
reference's SHIPPED model gazetteer, viability decided by a logistic over
hashed JVM-assembled features, scored via broadcast-join (no UDF).
"""

from __future__ import annotations

import zlib

import pyspark.sql.functions as F
import pytest

TRAIN_DIR = "/root/reference/tutorial/data/train"
TEST_DIR = "/root/reference/tutorial/data/test"


def test_feature_hash_matches_zlib_crc32(spark):
    """The JVM crc32 must equal zlib.crc32 so recorded/driver-side
    feature engineering and the Catalyst assembly share one hash space."""
    from dere_spark.operators.tagger import FEATURE_DIM, feature_hash

    vals = ["w=expression", "rg=Binding", "u_nom_of", "s4=tion", "pv=<s>"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", feature_hash(F.col("s")).alias("h")).collect()}
    for v in vals:
        assert got[v] == zlib.crc32(v.encode()) % FEATURE_DIM


def test_reference_gazetteer_loads(spark):
    from dere_spark.operators.tagger import load_reference_gazetteer

    gaz = load_reference_gazetteer(spark)
    rows = {(r["term"], r["span_type"]) for r in gaz.collect()}
    assert ("bound", "Binding") in rows
    assert ("expression", "Gene_expression") in rows
    # artifact lines with non-capitalized types are dropped
    assert not any(t[1] == "positive" for t in rows)


def test_surface_rates_cross_fit_totals_minus_own(spark):
    from dere_spark.operators.tagger import surface_rates

    toks = spark.createDataFrame(
        [
            ("d1#0", 0, "binds", "d1"),
            ("d1#0", 1, "binds", "d1"),
            ("d2#0", 0, "binds", "d2"),
            ("d2#0", 1, "acts", "d2"),
        ],
        "doc_id string, token_idx int, core string, src_doc string",
    )
    labels = spark.createDataFrame(
        [("d1#0", 0), ("d2#0", 0)], "doc_id string, token_idx int"
    )
    totals = {r["term"]: (r["n_occ"], r["n_trig"]) for r in surface_rates(toks, labels).collect()}
    assert totals == {"binds": (3, 2), "acts": (1, 0)}
    own = {
        (r["term"], r["src_doc"]): (r["n_occ"], r["n_trig"])
        for r in surface_rates(toks, labels, unit_col="src_doc").collect()
    }
    # per-unit counts; candidate-side subtraction yields totals-minus-own
    assert own[("binds", "d1")] == (2, 1)
    assert own[("binds", "d2")] == (1, 1)
    assert totals["binds"][0] - own[("binds", "d1")][0] == 1  # d1 sees d2's count


def test_type_assignment_rule_order(spark):
    from dere_spark.operators.tagger import type_assignment

    gaz = spark.createDataFrame(
        [
            ("expression", "Gene_expression"),
            ("expression", "Transcription"),
            ("bound", "Binding"),
            ("producting", "Gene_expression"),
            ("producting", "Positive_regulation"),
            ("mystery", "Localization"),
            ("mystery", "Regulation"),
        ],
        "term string, span_type string",
    )
    train_surfaces = spark.createDataFrame(
        [
            ("expression", "Gene_expression"),
            ("expression", "Gene_expression"),
            ("product", "Gene_expression"),  # prefix 'produc' shared
            ("regulated", "Regulation"),
            ("regulated", "Regulation"),
            ("regulated", "Regulation"),
        ],
        "term string, span_type string",
    )
    got = {r["term"]: r["span_type"] for r in type_assignment(gaz, train_surfaces).collect()}
    assert got["expression"] == "Gene_expression"  # rule 1: train majority
    assert got["bound"] == "Binding"  # rule 2: unambiguous
    assert got["producting"] == "Gene_expression"  # rule 3: shared 6-prefix
    assert got["mystery"] == "Regulation"  # rule 4: train type prior


def test_scoring_is_broadcast_join_no_udf(spark):
    """The viability scoring plan must contain no Python evaluation —
    the model is a joined dimension table."""
    from dere_spark.bionlp import tagger_tokens, train_trigger_tagger
    from dere_spark.operators.tagger import candidate_features, score_candidates
    from dere_spark.sources.brat import load_brat
    from dere_spark.taskspec import load_task_spec
    from dere_spark.bionlp import BIONLP_SPEC

    train = load_brat(spark, TRAIN_DIR, load_task_spec(BIONLP_SPEC))
    model, ttable, rates, gaz = train_trigger_tagger(spark, train, iterations=5)
    cands = candidate_features(tagger_tokens(train), gaz, rates)
    plan = score_candidates(cands, model)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan  # candidate side is pure Catalyst


@pytest.mark.slow  # full train + predict + evaluate on the tutorial corpus
def test_tagged_path_beats_gazetteer_held_out(spark):
    """VERDICT r2 next-step #1 (learned token tagger): the tagged path
    must beat every prior held-out number. Measured r5: span F1 0.5647 —
    the 0.55 north-rule span target is MET — frame F1 0.1818, via the r4
    per-type score calibration + r5 per-type unseen-gate calibration +
    r5 hyphen-subtoken candidates with longest-match-wins suppression
    (prior bests 0.506/0.1882 r4, 0.4773/0.1778 uncalibrated r3,
    0.377/0.108 gazetteer; calibrations tuned on TRAIN only, train span
    F1 unchanged at 0.7794 under the final config — full A/B chain in
    BASELINE.md r5)."""
    from dere_spark.bionlp import run_bionlp_eval_tagged

    r = run_bionlp_eval_tagged(spark, TRAIN_DIR, TEST_DIR)
    assert r.fscore("span") >= 0.55, r.fscore("span")
    assert r.fscore("frame") >= 0.18, r.fscore("frame")


def _synthetic_cands(spark, n=200):
    import zlib

    from dere_spark.operators.tagger import FEATURE_DIM

    rows = []
    for i in range(n):
        feats = [f"w=tok{i % 37}", f"s3={i % 11}", f"rg=T{i % 5}"]
        if i % 3 == 0:
            feats.append("pwin3")
        fids = sorted({zlib.crc32(s.encode()) % FEATURE_DIM for s in feats})
        rows.append((f"d{i % 7}", i, fids, 1 if (i % 37) < 6 and i % 3 == 0 else 0))
    return spark.createDataFrame(
        rows, "doc_id string, token_idx int, fids array<int>, label int"
    )


def test_fit_viability_distributed_parity(spark):
    """The sparse distributed fit equals the collect-based fit to float
    summation order (~1e-9) — same recipe the dense logreg learner pins."""
    import numpy as np

    from dere_spark.operators.tagger import fit_viability, fit_viability_distributed

    cands = _synthetic_cands(spark)
    local = fit_viability(cands, distributed=False, iterations=5)
    dist = fit_viability_distributed(cands, iterations=5)
    assert np.allclose(local.weights, dist.weights, atol=1e-9)
    assert abs(local.bias - dist.bias) < 1e-9


def test_fit_viability_distributed_parallelism_invariant(spark):
    """Bit-identical weights regardless of input partitioning (content
    buckets + ordered folds, the scaling criterion's correctness half)."""
    from dere_spark.operators.tagger import fit_viability_distributed

    cands = _synthetic_cands(spark)
    a = fit_viability_distributed(cands.repartition(2), iterations=3)
    b = fit_viability_distributed(cands.repartition(16, "token_idx"), iterations=3)
    assert a.weights == b.weights and a.bias == b.bias


def test_fit_rejects_duplicate_candidate_keys(spark):
    """ADVICE r4: class weights / gradient normalization silently change
    if candidate keys repeat — the fit must refuse, not re-weight."""
    from dere_spark.operators.tagger import fit_viability_distributed

    cands = _synthetic_cands(spark, n=50)
    dup = cands.unionByName(cands.limit(3))
    with pytest.raises(ValueError, match="duplicate candidate keys"):
        fit_viability_distributed(dup, iterations=1)


def test_fit_divergence_fails_with_actionable_message(spark):
    """ADVICE r4: a diverged weight vector would reach repr(float)='inf'
    inside the F.expr literal and die in an opaque AnalysisException; the
    fit must instead name the learning rate."""
    from dere_spark.operators.tagger import fit_viability_distributed

    cands = _synthetic_cands(spark, n=80)
    with pytest.raises(FloatingPointError, match="diverged.*lr=1e\\+300"):
        # lr*l2 overflows the weight-decay term to inf within 2 steps
        fit_viability_distributed(cands, iterations=5, lr=1e300, l2=1e10)


def test_fit_rejects_duplicate_keys_collect_path(spark):
    """The duplicate-key guard must cover BOTH backends: the collect
    path is the default below the auto-dispatch threshold, so a guard
    only in the distributed fit would leave the common annotated-corpus
    path silently re-weighting."""
    from dere_spark.operators.tagger import fit_viability

    cands = _synthetic_cands(spark, n=50)
    dup = cands.unionByName(cands.limit(3))
    with pytest.raises(ValueError, match="duplicate candidate keys"):
        fit_viability(dup, iterations=1)


def test_fit_divergence_final_iteration_and_collect_path(spark):
    """Divergence on the FINAL update must fail loudly too: the in-loop
    check only guards the next literal parse, so without a post-loop
    check a fit that diverges on its last step returns a non-finite
    model that scores garbage silently (NaN z orders above any gate in
    Spark). Same contract on the collect path."""
    from dere_spark.operators.tagger import fit_viability, fit_viability_distributed

    cands = _synthetic_cands(spark, n=80)
    # 2 iterations: step 0 leaves finite ~1e299 weights, step 1 (the
    # final update) overflows the l2 term — only a post-loop check sees it
    with pytest.raises(FloatingPointError, match="diverged"):
        fit_viability_distributed(cands, iterations=2, lr=1e300, l2=1e10)
    with pytest.raises(FloatingPointError, match="diverged"):
        fit_viability(cands, iterations=2, lr=1e300, l2=1e10, distributed=False)


def test_calibrate_type_thresholds_single_aggregation_semantics(spark):
    """VERDICT r4 'What's wrong #2': calibration is now one gold count +
    one aggregation. Semantics pinned on a hand-computable corpus,
    including the subtlety that a span predicted twice with different
    scores survives a threshold iff its MAX score clears it (the old
    filter-then-distinct behavior)."""
    from dere_spark.bionlp import calibrate_type_thresholds

    gold = spark.createDataFrame(
        [
            ("d1", 0, "A", 0, 3, "gold", "aaa"),
            ("d1", 0, "A", 5, 8, "gold", "aaa"),
            ("d1", 0, "B", 10, 13, "gold", "bbb"),
        ],
        "doc_id string, instance_idx int, span_type string, left int, right int, source string, text string",
    )
    # type A: two good preds (one duplicated at scores .3/.9 -> max .9)
    # and two junk preds at low score -> thresholding A at 0.6 removes
    # only junk, lifting precision with no recall loss.
    # type B: its one pred is correct at 0.65; raising B's threshold to
    # 0.7+ would cost recall, so B stays at 0.0.
    pred = spark.createDataFrame(
        [
            ("d1", 0, "A", 0, 3, 0.3),
            ("d1", 0, "A", 0, 3, 0.9),   # duplicate key, higher score
            ("d1", 0, "A", 5, 8, 0.8),
            ("d1", 0, "A", 20, 23, 0.2),  # junk
            ("d1", 0, "A", 30, 33, 0.1),  # junk
            ("d1", 0, "B", 10, 13, 0.65),
        ],
        "doc_id string, instance_idx int, span_type string, left int, right int, score double",
    )
    out = calibrate_type_thresholds({"spans": gold}, pred, grid=(0.6, 0.7, 0.8, 0.9))
    assert out == {"A": 0.6}


@pytest.mark.slow  # full train + two detections + two calibrations
def test_calibrate_unseen_thresholds_tutorial_values(spark):
    """r5 probe A (VERDICT r4 #7a), adopted: per-type UNSEEN viability
    gates learned from cross-fitted train detection. Values pinned on the
    tutorial corpus; loosening below the global 0.75 must be possible
    (Phosphorylation learns 0.55). Held-out A/B in BASELINE.md r5:
    span F1 0.506 -> 0.5122, frame unchanged."""
    from dere_spark.bionlp import (
        BIONLP_SPEC,
        calibrate_type_thresholds,
        calibrate_unseen_thresholds,
        detect_triggers_tagged,
        train_trigger_tagger,
    )
    from dere_spark.sources.brat import load_brat
    from dere_spark.taskspec import load_task_spec

    train = load_brat(spark, TRAIN_DIR, load_task_spec(BIONLP_SPEC))
    model, ttable, rates, gaz = train_trigger_tagger(spark, train)
    trig = detect_triggers_tagged(train, model, ttable, rates, gaz)
    thr = calibrate_type_thresholds(train, trig)
    unseen = calibrate_unseen_thresholds(
        train, model, ttable, rates, gaz, type_thresholds=thr
    )
    assert unseen == {
        "Binding": 0.8,
        "Localization": 0.9,
        "Negative_regulation": 0.7,
        "Phosphorylation": 0.55,
        "Protein_catabolism": 0.8,
    }
    # gates must not disturb train-side detection (train candidates are
    # all seen, so unseen gates are a no-op there)
    a = detect_triggers_tagged(train, model, ttable, rates, gaz, type_thresholds=thr)
    b = detect_triggers_tagged(
        train, model, ttable, rates, gaz,
        type_thresholds=thr, unseen_thresholds=unseen,
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_hyphen_subtoken_candidates_and_suppression(spark):
    """r5 probe B mechanism: a hyphenated token yields an extra candidate
    for its after-last-hyphen segment at the segment's offsets with a
    negative synthetic idx; a gated subtoken prediction is dropped iff its
    host also fired (longest match wins, reference-CRF non-overlap)."""
    import pyspark.sql.functions as F

    from dere_spark.bionlp import _suppress_covered_subtokens
    from dere_spark.operators.tagger import candidate_features

    toks = spark.createDataFrame(
        [
            ("d#0", 0, "gp41-induced", 10, 22, False),
            ("d#0", 1, "binds", 23, 28, False),
            ("d#0", 2, "x-y-induced", 30, 41, False),
        ],
        "doc_id string, token_idx int, core string, tleft int, tright int, is_protein boolean",
    )
    gaz = spark.createDataFrame(
        [("induced", "Positive_regulation"), ("binds", "Binding"),
         ("gp41-induced", "Positive_regulation")],
        "term string, span_type string",
    )
    cands = candidate_features(toks, gaz, None)
    got = {(r["low"], r["token_idx"], r["tleft"], r["tright"]) for r in cands.collect()}
    # whole-token hits
    assert ("gp41-induced", 0, 10, 22) in got
    assert ("binds", 1, 23, 28) in got
    # subtoken hits: after-LAST-hyphen segment, segment offsets, idx=-(host+1)
    assert ("induced", -1, 15, 22) in got
    assert ("induced", -3, 34, 41) in got
    assert len(got) == 4  # no subtoken for unhyphenated "binds"

    # suppression: host 0 fired -> sub -1 dropped; host 2 absent -> sub -3 kept
    gated = spark.createDataFrame(
        [("d#0", 0), ("d#0", -1), ("d#0", -3)], "doc_id string, token_idx int"
    )
    kept = {r["token_idx"] for r in _suppress_covered_subtokens(gated).collect()}
    assert kept == {0, -3}

    # without the flag: whole-token candidates only
    plain = candidate_features(toks, gaz, None, hyphen_subtokens=False)
    assert {r["token_idx"] for r in plain.collect()} == {0, 1}
