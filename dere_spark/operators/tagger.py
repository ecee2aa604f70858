"""Learned trigger tagger (M1/M2) — the engine-native stand-in for the
reference's CRF span classifier.

The reference detects trigger spans with a CRF whose core features are
membership in a shipped gazetteer (model-specs/training_gazetteer_bionlp,
induced from the full BioNLP'09 training corpus) plus word/context
features (dere/models/_baseline/span_classifier.py:69-183,294-322). This
module re-expresses that design Spark-first as a two-part model:

  1. **candidate generation** — tokens matching a gazetteer surface
     (broadcast join; the gazetteer file is the reference's own model
     spec, read as data);
  2. **viability classification** — a binary logistic over hashed
     lexical/context features deciding WHICH gazetteer hits are real
     triggers, with the type assigned by a deterministic rule table
     (train-majority surface -> unambiguous gazetteer type -> shared
     6-char-prefix type -> train type prior).

Physical strategy (the 100 TB story):
  * feature ASSEMBLY is pure Catalyst: arrays of feature strings built
    with `when`/`concat`, hashed with the JVM's `crc32` (bit-identical
    to zlib.crc32, pinned by test) — no Python touches a token;
  * SCORING is a broadcast join: candidate feature ids join the (~4k row)
    weight table, `sum(weight)` per candidate, sigmoid as a column — the
    model is "pushed back into the plan" as a dimension table instead of
    literal columns (operators/logreg.py pushes literals; a hashed
    feature space is the same idea at sparse width);
  * only the FIT collects — the design matrix of an *annotated* training
    corpus, which is small by nature (annotation is the expensive part);
    everything applied to the unbounded corpus stays JVM-side.

Training-time stats (per-surface trigger rates) are CROSS-FITTED: each
training document's candidates see rates computed from the OTHER
documents (totals minus own-doc counts, computed relationally), so the
model learns how to treat genuinely unseen surfaces — without this, the
"unseen" features never fire in training and the model degenerates to
memorization (measured: held-out recall 0.27 -> 0.53).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

#: the reference's shipped span-model gazetteer, read as data — resolved
#: through the shared, env-overridable root (dere_spark/refdata.py)
from dere_spark.refdata import REFERENCE_GAZETTEER

#: hashed feature space width (2^12: small enough to broadcast the weight
#: table everywhere, large enough that collisions are rare at ~40
#: features/candidate)
FEATURE_DIM = 4096

_NOMINAL_SUFFIXES = ("tion", "sion", "ment", "ance", "ence")

#: probe flag (VERDICT r3 #7): char-4 PREFIX surface feature ("p4=")
#: alongside the existing suffix 3/4-grams; default per the measured A/B
#: in BASELINE.md r4
_PREFIX4_FEATURES = False


def load_reference_gazetteer(
    spark: SparkSession, path: str = REFERENCE_GAZETTEER
) -> DataFrame:
    """(term, span_type) from the reference's gazetteer file — one
    `<Type> <surface>` line each; surfaces lowercased, lines whose type
    is not capitalized (stray artifacts like 'positive') dropped."""
    raw = spark.read.text(path).where(F.length("value") > 0)
    typ = F.split_part("value", F.lit(" "), F.lit(1))
    term = F.lower(F.substring("value", F.length(typ) + 2, 1 << 20))
    return (
        raw.select(typ.alias("span_type"), term.alias("term"))
        .where(F.col("span_type").rlike("^[A-Z]"))
        .where(F.length("term") > 0)
        .distinct()
    )


def feature_hash(col: Column, dim: int = FEATURE_DIM) -> Column:
    """Stable feature hashing: JVM crc32 (== zlib.crc32, test-pinned) mod
    the feature-space width."""
    return F.pmod(F.crc32(col.cast("binary")), F.lit(dim)).cast("int")


def candidate_features(
    tokens: DataFrame,
    gazetteer: DataFrame,
    rates: DataFrame | None,
    own_rates: DataFrame | None = None,
    unit_col: str | None = None,
    dim: int = FEATURE_DIM,
    hyphen_subtokens: bool = True,
) -> DataFrame:
    """Gazetteer-hit candidates with hashed feature-id arrays — all JVM.

    tokens: (doc_id, token_idx, core, tleft, tright, is_protein) — one
    row per trimmed token, `is_protein` true when the token lies inside a
    given Protein span. gazetteer: (term, span_type). rates: optional
    (term, n_occ, n_trig) per-surface stats from training documents.

    Cross-fitting (training only): pass ``own_rates`` (term, <unit_col>,
    n_occ, n_trig) per-unit counts plus ``unit_col`` naming the leave-out
    unit column on `tokens` — each candidate then sees totals MINUS its
    own unit's counts, so surfaces unique to one document train as
    genuinely unseen (totals-minus-own needs no per-document loop and no
    term x unit cross product).

    ``hyphen_subtokens`` (r5 probe B, adopted): web/biomedical text glues
    triggers into hyphen compounds ("gp41-induced") that the tokenizer
    correctly keeps whole, so the gold trigger inside can never align to
    a token candidate. When enabled, every hyphenated non-protein token
    also yields a candidate for its after-last-hyphen segment (offsets of
    the segment, context features of the host token, token_idx =
    -(host_idx+1) so candidate keys stay unique). Subtokens carry NO
    marker feature: the shipped fit runs hyphen_subtokens=False, so a
    fit-invisible feature's hash bucket would only contribute whatever
    weight an unrelated trained feature left there (measured r5: bucket
    732 held -0.065; removing the marker changed nothing held-out —
    A/B in BASELINE.md). Measured on the tutorial corpus: held-out span
    F1 0.5122 -> see BASELINE.md r5 probe B.

    Output: (doc_id, token_idx, low, tleft, tright, seen, fids).
    """
    w = Window.partitionBy("doc_id").orderBy("token_idx")
    toks = (
        tokens.withColumn("low", F.lower("core"))
        .withColumn("prev", F.coalesce(F.lag(F.lower("core")).over(w), F.lit("<s>")))
        .withColumn("nxt", F.coalesce(F.lead(F.lower("core")).over(w), F.lit("</s>")))
        .withColumn("pl1", F.coalesce(F.lag("is_protein").over(w), F.lit(False)))
        .withColumn("pr1", F.coalesce(F.lead("is_protein").over(w), F.lit(False)))
        .withColumn(
            "pwin3",
            F.max(F.col("is_protein").cast("int"))
            .over(w.rowsBetween(-3, 3))
            .cast("boolean"),
        )
    )
    if hyphen_subtokens:
        seg = F.element_at(F.split(F.col("core"), "-"), -1)
        sub = (
            toks.where(
                F.col("low").contains("-")
                & ~F.col("is_protein")
                & (F.length(seg) > 0)
            )
            .withColumn("core", seg)
            .withColumn("low", F.lower(seg))
            .withColumn("tleft", F.col("tright") - F.length(seg))
            .withColumn("token_idx", -(F.col("token_idx") + F.lit(1)))
        )
        toks = toks.unionByName(sub)
    # the Porter stem depends only on the surface and every candidate IS a
    # gazetteer surface, so stems are computed ONCE on the tiny gazetteer
    # dimension (existing F4 Arrow kernel) and broadcast in — the
    # corpus-side plan stays pure Catalyst
    from dere_spark.functions.porter import stem_tokens

    gaz_types = stem_tokens(
        gazetteer.groupBy("term").agg(
            F.sort_array(F.collect_set("span_type")).alias("types")
        ),
        token_col="term",
        out_col="stem",
    )
    cands = toks.where(~F.col("is_protein")).join(
        F.broadcast(gaz_types), toks["low"] == gaz_types["term"], "inner"
    )
    if rates is not None:
        cands = cands.join(F.broadcast(rates), "term", "left")
        if own_rates is not None and unit_col is not None:
            own = own_rates.select(
                "term",
                F.col(unit_col),
                F.col("n_occ").alias("_own_occ"),
                F.col("n_trig").alias("_own_trig"),
            )
            cands = (
                cands.join(F.broadcast(own), ["term", unit_col], "left")
                .withColumn(
                    "n_occ", F.col("n_occ") - F.coalesce("_own_occ", F.lit(0))
                )
                .withColumn(
                    "n_trig", F.col("n_trig") - F.coalesce("_own_trig", F.lit(0))
                )
                .drop("_own_occ", "_own_trig")
            )
    else:
        cands = cands.withColumn("n_occ", F.lit(None).cast("long")).withColumn(
            "n_trig", F.lit(None).cast("long")
        )
    low = F.col("low")
    nom = F.col("low").rlike("(" + "|".join(_NOMINAL_SUFFIXES) + ")$")
    unseen = F.coalesce(F.col("n_occ"), F.lit(0)) == 0
    rate = F.col("n_trig") / F.col("n_occ")
    opt = lambda cond, s: F.when(cond, F.array(F.lit(s))).otherwise(  # noqa: E731
        F.array().cast("array<string>")
    )
    base = [
        F.concat(F.lit("nrg="), F.least(F.size("types"), F.lit(4))),
        F.concat(F.lit("s3="), F.substring(low, -3, 3)),
        F.concat(F.lit("s4="), F.substring(low, -4, 4)),
        F.concat(F.lit("st="), F.col("stem")),
        F.concat(F.lit("pv="), F.col("prev")),
        F.concat(F.lit("nx="), F.col("nxt")),
        F.when(unseen, F.lit("unseen")).otherwise(
            F.concat(
                F.lit("rate="),
                F.when(F.col("n_trig") == 0, F.lit("0"))
                .when(rate < 0.5, F.lit("lo"))
                .otherwise(F.lit("hi")),
            )
        ),
    ]
    if _PREFIX4_FEATURES:
        base.append(F.concat(F.lit("p4="), F.substring(low, 1, 4)))
    feats = F.concat(
        F.array(*base),
        F.transform("types", lambda t: F.concat(F.lit("rg="), t)),
        opt(nom, "nom"),
        opt(F.col("nxt") == "of", "nx_of"),
        opt(F.col("prev") == "the", "pv_the"),
        opt(F.col("pl1"), "pl1"),
        opt(F.col("pr1"), "pr1"),
        opt(F.col("pwin3"), "pwin3"),
        opt(unseen & nom, "u_nom"),
        opt(unseen & (F.col("nxt") == "of"), "u_of"),
        opt(unseen & F.col("pwin3"), "u_pwin"),
        opt(unseen & nom & (F.col("nxt") == "of"), "u_nom_of"),
        opt(F.col("core").rlike("^[A-Z]"), "cap"),
        opt(low.contains("-"), "hyp"),
        opt(F.length(low) <= 3, "short"),
    )
    return cands.select(
        "doc_id",
        "token_idx",
        "core",
        "low",
        "tleft",
        "tright",
        (~unseen).alias("seen"),
        F.array_sort(
            F.array_distinct(F.transform(feats, lambda s: feature_hash(s, dim)))
        ).alias("fids"),
    )


def surface_rates(
    tokens: DataFrame, labels: DataFrame, unit_col: str | None = None
) -> DataFrame:
    """Per-surface trigger-rate counts from training tokens.
    `labels`: distinct (doc_id, token_idx) rows that ARE trigger starts.

    Without ``unit_col``: totals (term, n_occ, n_trig) — the predict-time
    table. With ``unit_col``: per-unit counts (term, <unit>, n_occ,
    n_trig) to pass as `candidate_features(own_rates=...)` for
    cross-fitted training."""
    lab = labels.select("doc_id", "token_idx").distinct().withColumn(
        "is_trig", F.lit(1)
    )
    keys = ["term"] + ([unit_col] if unit_col else [])
    t = tokens.join(lab, ["doc_id", "token_idx"], "left").select(
        F.lower("core").alias("term"),
        F.coalesce("is_trig", F.lit(0)).alias("is_trig"),
        *([F.col(unit_col)] if unit_col else []),
    )
    return t.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_occ"), F.sum("is_trig").alias("n_trig")
    )


@dataclass(frozen=True)
class TaggerModel:
    """Sparse logistic viability model over hashed features, plus the
    seen/unseen decision thresholds (unseen surfaces need stronger
    contextual evidence)."""

    weights: Tuple[float, ...]  # dense over [0, dim)
    bias: float
    dim: int = FEATURE_DIM
    threshold_seen: float = 0.55
    threshold_unseen: float = 0.75

    def weights_df(self, spark: SparkSession) -> DataFrame:
        rows = [(i, float(w)) for i, w in enumerate(self.weights) if w != 0.0]
        return spark.createDataFrame(rows, "fid int, w double")


#: above this many candidate rows, fit_viability auto-dispatches to the
#: distributed sparse fit (same auto-dispatch contract as the dense
#: logreg learner)
DISTRIBUTED_FIT_THRESHOLD = 50_000


def fit_viability(
    cands: DataFrame,
    label_col: str = "label",
    dim: int = FEATURE_DIM,
    iterations: int = 300,
    lr: float = 0.5,
    l2: float = 1e-4,
    distributed: bool | None = None,
    **thresholds: float,
) -> TaggerModel:
    """Class-balanced logistic fit over the hashed candidate features.

    ``distributed=None`` auto-dispatches: above
    DISTRIBUTED_FIT_THRESHOLD rows the sparse distributed fit runs (no
    training row reaches the driver); below it the design matrix is
    collected — the candidate set of an ANNOTATED corpus is small by
    nature (annotation cost, not corpus size, bounds it). Deterministic
    either way: rows sorted by content, zero init, fixed schedule,
    float64. Scoring of the unbounded corpus never collects
    (see `score_candidates`).

    Both backends fail loudly on duplicate (doc_id, token_idx) keys —
    class weights and gradient normalization assume one design row per
    candidate — and on a diverged (non-finite) fit."""
    if not distributed:
        # one small job covers dispatch AND the duplicate-key guard the
        # distributed backend fuses into its own head aggregation
        head = cands.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("doc_id", "token_idx").alias("n_keys"),
        ).first()
        n, n_keys = int(head["n"]), int(head["n_keys"])
        if distributed is None:
            distributed = n > DISTRIBUTED_FIT_THRESHOLD
        if not distributed and n_keys != n:
            raise ValueError(
                f"tagger training set has duplicate candidate keys: "
                f"{n} rows over {n_keys} distinct (doc_id, token_idx) "
                f"— dedupe candidates before fitting"
            )
    if distributed:
        return fit_viability_distributed(
            cands, label_col, dim, iterations, lr, l2, **thresholds
        )
    rows = (
        cands.select("fids", F.col(label_col).cast("double").alias("_y"))
        .sort(F.col("fids").cast("string"), "_y")
        .collect()
    )
    if not rows:
        raise ValueError("empty tagger training set")
    n = len(rows)
    X = np.zeros((n, dim), dtype=np.float64)
    y = np.array([r["_y"] for r in rows], dtype=np.float64)
    for i, r in enumerate(rows):
        X[i, list(r["fids"])] = 1.0
    n_pos = max(y.sum(), 1.0)
    n_neg = max(n - y.sum(), 1.0)
    sw = np.where(y > 0.5, n_neg / n_pos, 1.0)
    sw /= sw.mean()
    w = np.zeros(dim)
    b = 0.0
    for _ in range(iterations):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = (p - y) * sw
        w -= lr * (X.T @ g / n + l2 * w)
        b -= lr * g.mean()
    _check_fit_finite(w, b, lr, l2)
    return TaggerModel(tuple(float(x) for x in w), float(b), dim, **thresholds)


def _check_fit_finite(w: np.ndarray, b: float, lr: float, l2: float) -> None:
    """Fail loudly when GD diverged to non-finite weights — a returned
    model would otherwise score garbage silently (NaN z orders above any
    gate in Spark, so every candidate fires)."""
    if not (np.isfinite(w).all() and np.isfinite(b)):
        raise FloatingPointError(
            "tagger fit diverged to non-finite weights "
            f"(lr={lr}, l2={l2}); lower the learning rate"
        )


def fit_viability_distributed(
    cands: DataFrame,
    label_col: str = "label",
    dim: int = FEATURE_DIM,
    iterations: int = 300,
    lr: float = 0.5,
    l2: float = 1e-4,
    num_buckets: int = 64,
    **thresholds: float,
) -> TaggerModel:
    """Sparse distributed GD — the scale path: no training row reaches
    the driver; per iteration only ≤ dim+1 gradient scalars do.

    Physical shape: the per-candidate design rows (key, sorted fids, y,
    content bucket) are cached ONCE as a compact frame; each iteration is
    then a SINGLE Spark job (VERDICT r3 "What's wrong #3" — the old shape
    launched ~3 jobs/iteration: a weight-table broadcast plus separate
    gradient and bias collects, ~900 jobs/fit; this one launches
    iterations+1 total):
      * z per candidate: a fold over the PRE-SORTED fids adding
        `w[fid]` looked up in a constant-folded literal weight array —
        no join, no shuffle, bit-identical to the old fid-sorted
        struct fold (absent fids contribute exactly +0.0);
      * gradient per feature AND the bias term in one aggregation:
        per-candidate residuals explode to (fid, bucket) partial sums,
        the bias rides along as fid = -1, then an ordered fold over
        bucket partials — the dense learner's determinism recipe
        (operators/logreg.py) at sparse width, one collect.

    Weights are bit-identical across parallelism levels for fixed
    num_buckets; parity with the collect-based fit is ~1e-9 (float
    summation order only), pinned by test.

    One job per iteration is the floor for EXACT full-batch GD — step
    t+1's gradient needs step t's weights through a global reduce, so
    steps cannot fold into one job without changing the optimizer (and
    the pinned parity). Measured r4 (20 iters, 2k cands, local[8]):
    28.5 s -> 17.3 s, ~3 jobs/iter -> 1 (A/B in BASELINE.md)."""
    key = ["doc_id", "token_idx"]
    compact = (
        cands.select(
            *key,
            F.sort_array("fids").alias("fids"),
            F.col(label_col).cast("double").alias("_y"),
        )
        .withColumn("_b", F.pmod(F.xxhash64(*key), F.lit(num_buckets)).cast("int"))
        .repartition(num_buckets, *key)
        .persist()
    )
    try:
        head = compact.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("n_pos"),
            F.count_distinct(*[F.col(k) for k in key]).alias("n_keys"),
        ).first()
        n = int(head["n"])
        if n == 0:
            raise ValueError("empty tagger training set")
        # class weights, gradient normalization, and the per-row z all
        # assume one design row per candidate key; duplicated keys would
        # silently re-weight the fit (ADVICE r4) — fail loudly instead
        if int(head["n_keys"]) != n:
            raise ValueError(
                f"tagger training set has duplicate candidate keys: "
                f"{n} rows over {int(head['n_keys'])} distinct "
                f"(doc_id, token_idx) — dedupe candidates before fitting"
            )
        true_pos = float(head["n_pos"] or 0.0)
        true_neg = float(n) - true_pos
        # ratio clamps an absent class to 1 (mirrors the collect path's
        # max(...,1)); the mean normalizer uses TRUE counts — a clamped
        # count there diverges from the collect fit when a class is absent
        sw_pos_raw = max(true_neg, 1.0) / max(true_pos, 1.0)
        mean_w = (true_pos * sw_pos_raw + true_neg * 1.0) / n
        sw_pos = sw_pos_raw / mean_w
        sw_neg = 1.0 / mean_w

        w = np.zeros(dim)
        b = 0.0
        for _ in range(iterations):
            # one constant array literal, built as a SQL string: F.lit(list)
            # pays ~2 s of py4j round-trips for 4096 elements, F.expr parses
            # JVM-side in ~5 ms; D-suffixed repr round-trips doubles
            # bit-exactly (test-pinned parity). repr of a non-finite float
            # ('nan'/'inf') does NOT parse as a SQL double literal, so a
            # diverged fit would die in an opaque AnalysisException —
            # catch it here with an actionable message (ADVICE r4)
            _check_fit_finite(w, b, lr, l2)
            warr = F.expr(
                "array(" + ",".join(f"{float(x)!r}D" for x in w) + ")"
            )
            zcol = F.aggregate(
                F.col("fids"), F.lit(0.0), lambda acc, x: acc + F.get(warr, x)
            )
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(zcol + F.lit(float(b)))))
            g = (p - F.col("_y")) * F.when(
                F.col("_y") > 0.5, F.lit(sw_pos)
            ).otherwise(F.lit(sw_neg))
            contrib = compact.select("_b", "fids", g.alias("_g"))
            per_fid = (
                contrib.select("_b", "_g", F.explode("fids").alias("fid"))
                .groupBy("fid", "_b")
                .agg(F.sum("_g").alias("_s"))
            )
            bias_rows = (
                contrib.groupBy("_b")
                .agg(F.sum("_g").alias("_s"))
                .select(F.lit(-1).alias("fid"), "_b", "_s")
            )
            parts = (
                per_fid.unionByName(bias_rows)
                .groupBy("fid")
                .agg(
                    F.aggregate(
                        F.sort_array(F.collect_list(F.struct("_b", "_s"))),
                        F.lit(0.0),
                        lambda acc, x: acc + x["_s"],
                    ).alias("_gsum")
                )
                .collect()
            )
            grad_w = np.zeros(dim)
            sum_g = 0.0
            for r in parts:
                if r["fid"] < 0:
                    sum_g = r["_gsum"]
                else:
                    grad_w[r["fid"]] = r["_gsum"]
            w = w - lr * (grad_w / n + l2 * w)
            b = b - lr * (sum_g / n)
    finally:
        compact.unpersist()
    # the in-loop check guards the literal parse for iterations 1..k-1;
    # this one catches divergence on the FINAL update, which would
    # otherwise return a non-finite model silently
    _check_fit_finite(w, b, lr, l2)
    return TaggerModel(tuple(float(x) for x in w), float(b), dim, **thresholds)


def score_candidates(cands: DataFrame, model: TaggerModel) -> DataFrame:
    """Viability probability per candidate — a broadcast join + sum, no
    UDF: explode feature ids, join the weight table, re-aggregate. The
    candidate key (doc_id, token_idx) rides one hash partitioning."""
    spark = cands.sparkSession
    wdf = model.weights_df(spark)
    exploded = cands.select(
        "doc_id", "token_idx", F.explode("fids").alias("fid")
    )
    sums = (
        exploded.join(F.broadcast(wdf), "fid", "left")
        .groupBy("doc_id", "token_idx")
        .agg(F.sum(F.coalesce("w", F.lit(0.0))).alias("_z"))
    )
    z = F.col("_z") + F.lit(model.bias)
    scored = cands.join(sums, ["doc_id", "token_idx"]).withColumn(
        "viability", F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9)
    )
    thresh = F.when(F.col("seen"), F.lit(model.threshold_seen)).otherwise(
        F.lit(model.threshold_unseen)
    )
    return scored.withColumn("viable", F.col("viability") >= thresh).drop("_z")


def type_assignment(
    gazetteer: DataFrame,
    train_surfaces: DataFrame,
) -> DataFrame:
    """(term, span_type): the deterministic type rule as a dimension table.

    train_surfaces: (term, span_type) gold trigger surface observations
    (one row per occurrence). Rule per gazetteer surface:
      1. majority train type of the exact surface (count desc, name asc);
      2. else the gazetteer type if unambiguous;
      3. else gazetteer types sharing a 6-char prefix with any train
         surface of that type, the most train-frequent type winning;
      4. else the most train-frequent gazetteer type.
    """
    maj_w = Window.partitionBy("term").orderBy(
        F.col("n").desc(), F.col("span_type").asc()
    )
    surfmaj = (
        train_surfaces.groupBy("term", "span_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(maj_w))
        .where(F.col("rk") == 1)
        .select("term", F.col("span_type").alias("maj_type"))
    )
    prior = train_surfaces.groupBy("span_type").agg(F.count(F.lit(1)).alias("prior"))
    prefixes = train_surfaces.select(
        "span_type", F.substring("term", 1, 6).alias("pfx")
    ).distinct()
    g = gazetteer.withColumn("pfx", F.substring("term", 1, 6))
    scored = (
        g.join(F.broadcast(prior), "span_type", "left")
        .join(
            F.broadcast(prefixes.withColumn("shared", F.lit(True))),
            ["span_type", "pfx"],
            "left",
        )
        .na.fill({"prior": 0})
        .withColumn("shared", F.coalesce("shared", F.lit(False)))
    )
    # unambiguous beats everything below majority; then shared-prefix pool
    pick_w = Window.partitionBy("term").orderBy(
        F.col("shared").desc(), F.col("prior").desc(), F.col("span_type").desc()
    )
    n_types = Window.partitionBy("term")
    picked = (
        scored.withColumn("_n", F.count(F.lit(1)).over(n_types))
        .withColumn("rk", F.row_number().over(pick_w))
        .where((F.col("_n") == 1) | (F.col("rk") == 1))
        .select("term", F.col("span_type").alias("gaz_type"))
    )
    return (
        picked.join(F.broadcast(surfmaj), "term", "left")
        .select("term", F.coalesce("maj_type", "gaz_type").alias("span_type"))
    )
