"""Porter stemmer — F4 (the reference stems via nltk PorterStemmer,
span_classifier.py:25,54,412-413). Fresh implementation of the published
algorithm (M.F. Porter, "An algorithm for suffix stripping", Program 1980)
— steps 1a/1b/1c/2/3/4/5a/5b over the standard measure/vowel predicates.

Exposed two ways: `porter_stem` (plain function, used inside Arrow
kernels) and `stem_tokens` (mapInPandas column transform). There is no
Spark/DuckDB builtin (the fts extension is unavailable offline), so
engine queries using it get rows-only driver checks.
"""

from __future__ import annotations

_VOWELS = set("aeiou")


def _is_consonant(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Count of VC sequences in the [C](VC)^m[V] decomposition."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        v = not _is_consonant(stem, i)
        if prev_vowel and not v:
            m += 1
        prev_vowel = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(word) < 3:
        return False
    return (
        _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def _replace(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    if not word.endswith(suffix):
        return None
    stem = word[: len(word) - len(suffix)]
    if _measure(stem) > min_m:
        return stem + repl
    return word


def porter_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_consonant(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (m > 0)
    step2 = [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ]
    for suffix, repl in step2:
        if w.endswith(suffix):
            out = _replace(w, suffix, repl, 0)
            if out is not None:
                w = out
            break

    # step 3 (m > 0)
    step3 = [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]
    for suffix, repl in step3:
        if w.endswith(suffix):
            out = _replace(w, suffix, repl, 0)
            if out is not None:
                w = out
            break

    # step 4 (m > 1)
    step4 = [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ]
    fired = False
    for suffix in step4:
        if w.endswith(suffix):
            stem = w[: len(w) - len(suffix)]
            if _measure(stem) > 1:
                w = stem
            fired = True  # one rule per step: longest/first match decides
            break
    # the (m>1 and (*S or *T))ION rule — part of step 4, mutually exclusive
    if (
        not fired
        and w.endswith("ion")
        and len(w) > 3
        and w[-4] in "st"
        and _measure(w[:-3]) > 1
    ):
        w = w[:-3]

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # step 5b
    if _measure(w) > 1 and _ends_double_consonant(w) and w.endswith("l"):
        w = w[:-1]

    return w


def stem_tokens(tokens, token_col: str = "token", out_col: str = "stem"):
    """DataFrame transform: append a Porter-stemmed column via an Arrow
    kernel (vectorized at batch level; the stemmer itself is per-string —
    the same granularity the reference's nltk call has)."""
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    out_schema = StructType(
        list(tokens.schema.fields) + [StructField(out_col, StringType())]
    )
    in_cols = [f.name for f in tokens.schema.fields]

    def run(batches):
        for batch in batches:
            out = batch[in_cols].copy()
            out[out_col] = batch[token_col].map(porter_stem)
            yield out

    return tokens.mapInPandas(run, out_schema)
