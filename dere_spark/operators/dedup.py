"""Document deduplication operators — the training-data-pipeline workhorses.

All hashing is ``md5`` over UTF-8 (identical in Spark and DuckDB, so every
step is oracle-checkable) and all arithmetic integer/lexicographic, making
outputs bit-stable across engines and parallelism levels.

Operators:
  * exact dedup — hash-groupBy on content (see queries.dedup_exact);
  * n-gram shingling — token 3-grams per doc;
  * MinHash signatures — k permutations simulated as md5(seed || shingle),
    min per (doc, seed) (standard MinHash; Broder '97);
  * LSH banding — k hashes split into b bands of r rows; band signature =
    md5 of the concatenated row hashes; docs sharing any band bucket are
    candidate near-duplicates. Pr[candidate] = 1-(1-s^r)^b for Jaccard s;
  * candidate verification — exact Jaccard on shingle sets, computed by a
    shingle-level join (only over candidates, never all pairs);
  * clusters — connected components over verified near-dup pairs
    (generalizing the reference scorer's Equiv closure,
    deRE_evaluation.py:92-99);
  * SimHash — 64-bit sign-of-weighted-bit-sums fingerprint (Charikar '02)
    with banded blocking for small-Hamming-distance lookup.

Scale notes: everything shuffles on (doc_id) or (shingle/bucket) keys only;
the pairwise phase is restricted to LSH candidates so cost is output-bound,
not O(n²). Shingle-frequency skew (boilerplate) is the known hot spot —
`max_bucket` caps degenerate buckets explicitly (no silent cap: capped
buckets are counted in the returned metrics when requested).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from dere_spark.operators.graph import connected_components


def shingles(tokens: DataFrame, n: int = 3) -> DataFrame:
    """tokens(doc_id, token_idx, token) -> distinct (doc_id, shingle)."""
    w = Window.partitionBy("doc_id").orderBy("token_idx")
    cols = [F.col("token")] + [F.lead("token", i).over(w) for i in range(1, n)]
    return (
        tokens.select("doc_id", F.concat_ws(" ", *cols).alias("shingle"),
                      F.lead("token", n - 1).over(w).alias("_last"))
        .where(F.col("_last").isNotNull())
        .select("doc_id", "shingle")
        .distinct()
    )


def shingle_arrays(
    documents: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """documents(doc_id, text) -> (doc_id, shingles: array<string>) with the
    doc's DISTINCT token n-grams — entirely per-row (guide §2.4/§4.1).

    Value-identical to ``shingles(tokenize(documents))`` reshaped as one
    array row per document: the n-gram at position i is tokens[i..i+n-1]
    joined by the separator, exactly what the window-lead formulation
    emits, and ``array_distinct`` is the per-row equivalent of the global
    ``.distinct()`` (the set is per-document either way). The physical
    win: no token explode, no per-document window sort, and no
    (doc_id, shingle) distinct exchange — the whole shingle stage rides
    the document scan inside whole-stage codegen with ZERO shuffles.

    Parity details with the row formulation:
      * docs with < n tokens produced no shingle rows -> dropped here by
        the token-count pre-filter (size(shingles) > 0 ⟺ the doc has at
        least n tokens, so filtering on the SOURCE predicate is
        equivalent — and crucially it keeps the optimizer from pushing a
        filter ON the expensive derived column down to the scan with the
        whole shingle expression inlined, which r7 measured as a 17-40x
        regression: the filter then re-ran split(text) per lambda
        element, single-threaded, below the repartition);
      * NULL text produced no exploded tokens -> size(split(NULL)) is
        NULL -> the same pre-filter drops it.

    Physical-shape invariants (measured, r7): ``_toks`` is materialized
    in its own projection and referenced several times by the gram
    expression, and ``shingles`` itself is expensive + multiply
    referenced by every consumer this module ships — both block
    CollapseProject from inlining the expression into downstream
    lambdas, where interpreted HOF evaluation would recompute it per
    outer-lambda element (no common-subexpression elimination there).
    """
    toks = F.split(F.col(text_col), " ", -1)
    tk = F.col("_toks")
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.get(tk, i + j) for j in range(n)]
    )
    grams = F.transform(F.sequence(F.lit(0), F.size(tk) - n), gram)
    return (
        documents.where(F.size(toks) >= n)
        .select("doc_id", toks.alias("_toks"))
        .select("doc_id", F.array_distinct(grams).alias("shingles"))
    )


def explode_shingles(shingle_arr: DataFrame) -> DataFrame:
    """(doc_id, shingles) -> the row form (doc_id, shingle) for consumers
    that genuinely need shingle-level rows (the Jaccard verify join).

    explode_outer, deliberately: plain explode triggers
    InferFiltersFromGenerate, which pushes an inferred
    ``size(shingles) > 0`` — with the entire shingle expression INLINED —
    below the repartition to the single-task scan (r7 measured 5x on this
    step alone). The arrays are non-empty by shingle_arrays' construction;
    the cheap NOT NULL filter on the generator OUTPUT (which cannot be
    pushed below the Generate, so the trap stays closed) makes that an
    enforced contract rather than a docstring one — an empty or NULL
    array from some other producer drops the doc exactly like the inner
    explode did, instead of leaking a NULL-shingle row into md5/concat_ws
    (which skips NULLs and would fabricate a phantom signature)."""
    return shingle_arr.select(
        "doc_id", F.explode_outer("shingles").alias("shingle")
    ).where(F.col("shingle").isNotNull())


def minhash_signatures(shingle_df: DataFrame, num_hashes: int = 16) -> DataFrame:
    """(doc_id, shingle) -> (doc_id, seed, minhash).

    One md5 family member per seed; min over the doc's shingles. The
    explode of seeds happens BEFORE the groupBy so the aggregation is a
    single partial+final hash agg — no per-seed jobs.
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    hashed = shingle_df.select(
        "doc_id",
        seeds,
        "shingle",
    ).select(
        "doc_id",
        "seed",
        F.md5(F.concat_ws("|", F.col("seed"), F.col("shingle"))).alias("h"),
    )
    return hashed.groupBy("doc_id", "seed").agg(F.min("h").alias("minhash"))


def lsh_bands(signatures: DataFrame, bands: int = 4) -> DataFrame:
    """(doc_id, seed, minhash) -> (doc_id, band, band_sig).

    band = seed % bands; band signature = md5 of the band's row hashes
    concatenated in seed order (sort_array on (seed, minhash) structs keeps
    the order deterministic under any partitioning).
    """
    return (
        signatures.withColumn("band", F.col("seed") % bands)
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("seed", "minhash"))),
                        lambda s: s["minhash"],
                    ),
                )
            ).alias("band_sig")
        )
    )


def lsh_bands_fused(
    shingle_df: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """(doc_id, shingle) -> (doc_id, band, band_sig) in ONE shuffle.

    Value-identical to ``lsh_bands(minhash_signatures(df, num_hashes),
    bands)`` (oracle-checked by the same gates), but the per-seed min and
    the per-band signature are computed as array expressions inside a
    single groupBy(doc_id) instead of two further shuffled aggregations:
    collect the doc's shingles once, then for each band take the seeds
    ``band, band+bands, ...`` (ascending == seed order), min-md5 per seed
    via array_min, and md5 the comma-joined minhashes. Cuts the LSH chain
    from 3 exchanges to 1 — at 100 TB the shuffle volume saved is 2x the
    signature table; r4 measured ~1.4x on the warm entity-canonicalization
    and document-LSH bench queries (BASELINE.md r4).

    Degenerate config ``bands > num_hashes``: the staged chain emits rows
    only for bands that own at least one seed (seed % bands covers just
    the first num_hashes bands), so the fused band loop is capped at
    ``min(bands, num_hashes)`` — an uncapped loop would hand F.sequence a
    start > stop and fail at runtime with an opaque 'Illegal sequence
    boundaries' error (ADVICE r4)."""
    per_doc = shingle_df.groupBy("doc_id").agg(
        F.collect_list("shingle").alias("_sh")
    )
    return _bands_from_array(per_doc, "_sh", num_hashes, bands)


def _minhash_expr(sh_col, seed):
    """min over the shingle array of md5(seed || '|' || shingle) — the md5
    hash-family member every dedup gate's oracle pins."""
    return F.array_min(
        F.transform(sh_col, lambda s: F.md5(F.concat_ws("|", seed, s)))
    )


def _bands_from_array(
    df: DataFrame, sh_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """(doc_id, <sh_col>: array<string>) -> (doc_id, band, band_sig)."""
    band_sig = lambda b: F.md5(  # noqa: E731
        F.concat_ws(
            ",",
            F.transform(
                F.sequence(F.lit(b), F.lit(num_hashes - 1), F.lit(bands)),
                lambda seed: _minhash_expr(F.col(sh_col), seed),
            ),
        )
    )
    banded = df.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), band_sig(b).alias("band_sig")
                    )
                    for b in range(min(bands, num_hashes))
                ]
            )
        ).alias("_b"),
    )
    return banded.select(
        "doc_id", F.col("_b.band").alias("band"), F.col("_b.band_sig").alias("band_sig")
    )


def lsh_bands_rowwise(
    shingle_arr: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """(doc_id, shingles: array) -> (doc_id, band, band_sig) with ZERO
    exchanges: the per-row twin of ``lsh_bands_fused`` for inputs that
    already carry one shingle array per document (`shingle_arrays`).
    Same band/minhash arithmetic, so the same oracles pin it; the
    groupBy(doc_id) collect the fused variant pays is simply not needed.
    """
    return _bands_from_array(shingle_arr, "shingles", num_hashes, bands)


def minhash_from_arrays(
    shingle_arr: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """(doc_id, shingles: array) -> (doc_id, seed, minhash), shuffle-free.

    Value-identical to ``minhash_signatures`` (same md5 family, same min
    per (doc, seed) — posexplode position IS the seed), but the min runs
    as array_min inside the row instead of a shuffled min-aggregation
    over num_hashes x shingles exploded rows.

    Trade-off (r7, measured at sf1.0): this form wins when every
    signature VALUE is consumed (1.67 vs 2.36 s noop — no 16x row
    explode, no aggregation hash table), while
    ``minhash_signatures(explode_shingles(arr))`` wins when a consumer
    lets the optimizer prune the min(md5) aggregate (codegen md5 and a
    prunable aggregate tail; 0.66 vs 1.75 s under a bare count)."""
    # one expression per seed (NOT a lambda over sequence(0, k-1)): the
    # k explicit references to `shingles` keep CollapseProject from
    # inlining the shingle expression into this projection — a
    # single-reference nested-lambda form re-evaluated the whole shingle
    # build once per seed per row (measured 40x at sf1.0, r7)
    mh = F.array(
        *[
            _minhash_expr(F.col("shingles"), F.lit(seed))
            for seed in range(num_hashes)
        ]
    )
    return shingle_arr.select(
        "doc_id", F.posexplode(mh).alias("seed", "minhash")
    )


def lsh_bands_minagg(
    shingle_rows: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """(doc_id, shingle) rows -> (doc_id, band, band_sig) via codegen md5
    COLUMNS + a k-accumulator min aggregation (r7).

    Same band/minhash arithmetic as ``lsh_bands_fused`` /
    ``lsh_bands_rowwise`` (oracle-pinned), different physical strategy:
    each shingle row computes its k seed-md5s as ordinary projected
    columns (whole-stage codegen — no interpreted HOF lambda, no k-times
    seed explode), groupBy(doc_id) folds k ``min`` accumulators (no
    exchange when the input is doc_id-partitioned, the pipeline norm),
    and the per-band signature is a plain projection over the k min
    columns. Interleaved fresh-plan A/B at sf1.0 (candidate-pair query,
    min-of-5): 2.00 s vs 2.38 s for the per-row-array form — codegen
    md5 beats interpreted-HOF md5 once shingle volume dominates. The
    per-row form (`lsh_bands_rowwise`) stays the right choice for
    small, stage-count-bound inputs (the entity-canonicalization path):
    it adds zero stages on top of its input.
    """
    hashed = shingle_rows.select(
        "doc_id",
        *[
            F.md5(F.concat_ws("|", F.lit(s), F.col("shingle"))).alias(f"_m{s}")
            for s in range(num_hashes)
        ],
    )
    mins = hashed.groupBy("doc_id").agg(
        *[F.min(f"_m{s}").alias(f"_m{s}") for s in range(num_hashes)]
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    ",", *[F.col(f"_m{s}") for s in range(b, num_hashes, bands)]
                )
            ).alias("band_sig"),
        )
        for b in range(min(bands, num_hashes))
    ]
    return mins.select(
        "doc_id", F.explode_outer(F.array(*band_structs)).alias("_b")
    ).select(
        "doc_id", F.col("_b.band").alias("band"), F.col("_b.band_sig").alias("band_sig")
    )


def capped_lsh_buckets(band_df: DataFrame, max_bucket: int = 1000) -> DataFrame:
    """The buckets `candidate_pairs_lsh` will DROP at this cap: one row
    (band, band_sig, bucket_size) per over-cap bucket. Run it with the
    same arguments to audit recall loss before (or after) pairing — the
    'no silent caps' probe; empty means the cap bound nothing."""
    return (
        band_df.groupBy("band", "band_sig")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .where(F.col("bucket_size") > max_bucket)
    )


def candidate_pairs_lsh(band_df: DataFrame, max_bucket: int = 1000) -> DataFrame:
    """Docs sharing any band bucket -> distinct (doc_a, doc_b), doc_a < doc_b.

    Degenerate buckets (boilerplate shingles collapsing many docs) are
    capped at ``max_bucket`` members: without the cap one such bucket
    goes quadratic in the self-join. The drop is auditable, not silent —
    `capped_lsh_buckets(band_df, max_bucket)` reports exactly which
    buckets (and how many members) the cap excluded.
    """
    sized = band_df.withColumn(
        "bucket_size",
        F.count(F.lit(1)).over(Window.partitionBy("band", "band_sig")),
    ).where(F.col("bucket_size") <= max_bucket)
    # Pair generation happens IN the bucket, not via a self-join: the old
    # a⋈b formulation planned the entire upstream band pipeline TWICE
    # (once per join side; one side additionally broadcast), so the
    # shingle+minhash md5 work — the dominant cost — was double-paid.
    # Collecting each surviving bucket's members (bounded by max_bucket,
    # enforced BEFORE the collect by the window filter, so no over-cap
    # bucket ever materializes as an array) and expanding sorted i<j
    # combinations per row computes the upstream exactly once and reuses
    # the window's (band, band_sig) partitioning for a no-exchange
    # aggregation (r7, guide §2.4/§3.3).
    # array_distinct after the sort keeps the old self-join's exact
    # contract: a doc_id appearing twice in one bucket must not emit a
    # (d, d) self-pair (the a.doc_id < b.doc_id guard excluded it), and
    # distinct stays sorted because array_distinct keeps first
    # occurrences. The cap above still counts ROWS, as before.
    buckets = (
        sized.groupBy("band", "band_sig")
        .agg(
            F.array_distinct(F.sort_array(F.collect_list("doc_id"))).alias(
                "_docs"
            )
        )
        .where(F.size("_docs") >= 2)
    )
    # explode_outer: dodges InferFiltersFromGenerate, which would
    # otherwise evaluate the full pair-expansion expression a second
    # time in an inferred size>0 filter (buckets hold >= 2 docs, so the
    # pair array is never empty and outer == inner).
    pairs = buckets.select(
        F.explode_outer(
            F.flatten(
                F.transform(
                    "_docs",
                    lambda x, i: F.transform(
                        F.slice("_docs", i + F.lit(2), F.size("_docs")),
                        lambda y: F.struct(
                            x.alias("doc_a"), y.alias("doc_b")
                        ),
                    ),
                )
            )
        ).alias("_p")
    )
    return pairs.select("_p.doc_a", "_p.doc_b").distinct()


def jaccard_verify(pairs: DataFrame, shingle_df: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate pairs via a shingle-level join.

    |A∩B| from joining both sides' shingles; |A∪B| = |A|+|B|-|A∩B|.
    """
    sizes = shingle_df.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = shingle_df.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = shingle_df.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "n_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.coalesce("n_inter", F.lit(0))
                / (F.col("n_a") + F.col("n_b") - F.coalesce("n_inter", F.lit(0)))
            ).alias("jaccard"),
        )
    )


def near_dup_clusters(verified: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Connected components over pairs with jaccard >= threshold."""
    edges = verified.where(F.col("jaccard") >= threshold).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    return connected_components(edges)


def filter_near_dups(
    docs: DataFrame, clusters: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The dedup END-USE: drop every cluster member except its
    representative (the component label, i.e. the min id — deterministic
    across parallelism). Docs in no cluster pass through.

    Anti-join shape, strategy left to the optimizer: this operator runs
    precisely on dup-heavy corpora, so the loser list is NOT guaranteed
    small — at a 30-50% duplicate rate on 100 TB it is billions of ids, and
    a forced ``F.broadcast`` hint would bypass autoBroadcastJoinThreshold
    and OOM the driver/executors (VERDICT r3 "What's wrong #1"). With no
    hint, AQE broadcasts when the loser side is actually under threshold
    and falls back to a shuffled anti-join when it isn't — the correct
    behavior at both ends of the dup-rate spectrum."""
    losers = clusters.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(shingle_df: DataFrame, half_bits: int = 32) -> DataFrame:
    """(doc_id, shingle) -> (doc_id, simhash_hi, simhash_lo) fingerprint.

    64-bit SimHash carried as two 32-bit halves so every operation stays
    exact: md5 hex chars 1-8 are the high word, 9-16 the low word; values
    < 2^32 are exactly representable in doubles, so floor-div/mod bit
    extraction is bit-exact and identical in Spark and DuckDB (the hex→int
    step is ``conv``/``::UBIGINT`` respectively). A bit votes +1/-1 per
    shingle; fingerprint bit = sign of the vote sum.
    """
    # r7 probe, REJECTED after honest measurement: a single
    # 64-accumulator groupBy(doc_id) aggregation (one sum per bit per
    # half, no bit explode) looked attractive on paper but measured
    # SLOWER on both metrics at sf1.0 under interleaved A/B — 1.97 vs
    # 1.20 s warm count and 3.34 vs 1.92 s noop full compute (the wide
    # codegen'd update method loses to 32x cheap rows through compact
    # hash aggregates; both per-doc-id aggregations below run without
    # any exchange on doc_id-partitioned input anyway). The staged
    # two-aggregation shape stays.
    h = shingle_df.select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(F.md5("shingle"), 9, 8), 16, 10).cast("long").alias("lo"),
    )
    bit = F.explode(F.sequence(F.lit(0), F.lit(half_bits - 1))).alias("bit")
    pw = F.pow(F.lit(2.0), F.col("bit")).cast("long")
    votes = (
        h.select("doc_id", bit, "hi", "lo")
        .select(
            "doc_id",
            "bit",
            (F.floor(F.col("hi") / pw) % 2 * 2 - 1).alias("vote_hi"),
            (F.floor(F.col("lo") / pw) % 2 * 2 - 1).alias("vote_lo"),
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum("vote_hi").alias("v_hi"), F.sum("vote_lo").alias("v_lo"))
    )
    pw2 = F.pow(F.lit(2.0), F.col("bit")).cast("long")
    return votes.groupBy("doc_id").agg(
        F.sum(F.when(F.col("v_hi") > 0, pw2).otherwise(F.lit(0))).alias("simhash_hi"),
        F.sum(F.when(F.col("v_lo") > 0, pw2).otherwise(F.lit(0))).alias("simhash_lo"),
    )


def simhash_bands(fingerprints: DataFrame) -> DataFrame:
    """Split the 64-bit fingerprint into 4 exact-match 16-bit bands.

    Near-duplicates within Hamming distance 3 share at least one band
    (pigeonhole), so banding turns Hamming lookup into equi-join blocking.
    """
    rows = []
    for half, col in (("hi", "simhash_hi"), ("lo", "simhash_lo")):
        for k in (0, 1):
            rows.append(
                F.struct(
                    F.lit(f"{half}{k}").alias("band"),
                    (F.floor(F.col(col) / F.lit(65536 ** k)) % 65536)
                    .cast("long")
                    .alias("band_val"),
                )
            )
    return fingerprints.select(
        "doc_id", F.explode(F.array(*rows)).alias("b")
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.band_val").alias("band_val"))
