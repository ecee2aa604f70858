"""Randomized offset-fidelity fuzz for every tokenizer strategy.

The text-fidelity invariant (every token addresses a verbatim substring of
the raw document — the engine analog of the reference's load-time
``span.text == span_string`` assertion, brat_corpus_io.py:158) is gated on
the synthetic corpus by `kg_text_fidelity`/`treebank_fidelity`. This fuzz
drives it with ADVERSARIAL text instead: random printable strings heavy in
the punctuation the Treebank rules rewrite (quotes, brackets, contractions,
ellipses), plus whitespace edge shapes — batched through one DataFrame per
strategy so the property runs at Spark speed."""

from __future__ import annotations

import random
import string

import pytest


ALPHABET = (
    [*string.ascii_letters, *string.digits]
    + list(" " * 12)  # heavy whitespace
    + list(".,;:!?\"'()[]{}%$#&-")
    + ["...", "''", "``", "n't", "'s", "cannot", "d'ye", "gonna", "--", "  "]
)


def _random_texts(seed: int, n: int = 150) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.randrange(0, 60)
        text = "".join(rng.choice(ALPHABET) for _ in range(k))
        rows.append((f"fz{i}", text))
    # fixed edge shapes on top of the random pool
    rows += [
        ("e0", ""),
        ("e1", " "),
        ("e2", "  leading and trailing  "),
        ("e3", "\"quoted\" text (with brackets) and Dr. No's ellipsis..."),
        ("e4", "can't won't shan't 'tis 'twas more'n wanna gotta"),
        ("e5", "a" * 500),
        ("e6", "one two  three   four"),
    ]
    return rows


@pytest.mark.parametrize("strategy", ["whitespace", "treebank", "treebank_arrow"])
@pytest.mark.parametrize("seed", [3, 91])
def test_tokenizer_fuzz_fidelity(spark, strategy, seed):
    from dere_spark.operators.tokenize import fidelity_violations, tokenize

    docs = spark.createDataFrame(_random_texts(seed), "doc_id string, text string")
    if strategy == "whitespace":
        toks = tokenize(docs)
    elif strategy == "treebank":
        from dere_spark.operators.treebank import tokenize_treebank_sql

        toks = tokenize_treebank_sql(docs)
    else:
        from dere_spark.operators.treebank import tokenize_treebank

        toks = tokenize_treebank(docs)
    bad = fidelity_violations(docs, toks)
    rows = bad.limit(5).collect()
    assert not rows, f"{strategy}/seed{seed}: offset fidelity broken: {rows}"


@pytest.mark.parametrize("seed", [17])
def test_treebank_sql_matches_arrow_kernel_on_fuzz(spark, seed):
    """The JVM regexp-chain Treebank and the Arrow-kernel Treebank are two
    implementations of the same nltk-3.3 rule set — on random punctuated
    text they must produce identical (doc_id, token_idx, token, left,
    right) streams, not just pass fidelity independently."""
    from dere_spark.operators.treebank import tokenize_treebank, tokenize_treebank_sql

    docs = spark.createDataFrame(_random_texts(seed), "doc_id string, text string")
    cols = ["doc_id", "token_idx", "token", "left", "right"]
    a = tokenize_treebank_sql(docs).select(cols)
    b = tokenize_treebank(docs).select(cols)
    delta = a.exceptAll(b).unionByName(b.exceptAll(a)).limit(10).collect()
    assert not delta, f"strategy divergence: {delta}"


def test_tolerant_aligner_quote_spellings_are_directional():
    """ADVICE r4: the tolerant realignment pattern must let each rewritten
    quote form match only ITS possible source spellings. Per the nltk-3.3
    quote rules, `` may come from ``, ", or a post-bracket '' — but ''
    may come only from '' or ", never from ``. The old sequential-replace
    pattern construction nested the alternations and allowed both."""
    from dere_spark.operators.treebank import treebank_spans

    # `` <- '': the STARTING_QUOTES bracket rule converts the final '' of
    # this text into a `` token; strict alignment fails, tolerant must map
    # the token back onto the literal '' source characters
    text = "''b``''"
    spans = treebank_spans(text)
    assert [text[a:b] for a, b in spans] == ["''b", "``", "''"]

    # '' must never land on `` source: fuzz 20k random quote-dense texts
    # through the full spans path and assert no ''-bearing token ever
    # aligns onto source text containing `` (the old nested pattern did)
    import random

    from dere_spark.operators.treebank import treebank_tokens

    random.seed(11)
    alpha = ['"', "''", "``", "a", "b", " ", "(", "'"]
    for _ in range(20000):
        t = "".join(random.choice(alpha) for _ in range(random.randint(3, 9)))
        try:
            toks = treebank_tokens(t)
            spans = treebank_spans(t)
        except ValueError:
            continue  # truly unalignable adversarial input
        for tok, (a, b) in zip(toks, spans):
            if "''" in tok:
                assert "``" not in t[a:b], (
                    f"'' token {tok!r} aligned onto `` source in {t!r}"
                )
