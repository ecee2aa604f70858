"""Treebank-parity offset tokenizer (F5).

The reference tokenizes with ``nltk.tokenize.TreebankWordTokenizer``
(pinned nltk==3.3 in the reference's setup.py), using ``span_tokenize``
for character offsets (dere/models/_baseline/span_classifier.py:25,265,
361,422). nltk is not installable here, so this module re-implements the
PUBLISHED nltk 3.3 algorithm — the Penn-Treebank sed-script regex chain
(MacIntyre's tokenizer.sed, distributed with nltk under Apache-2.0) plus
nltk's quote-back conversion and ``align_tokens`` offset recovery — from
the published description. Parity is pinned by recorded expected vectors
in tests/test_treebank.py (including nltk's own documented example).

Execution strategy: the regex chain is applied whole-document (one pass
per rule per document — C-speed ``re`` over megabyte strings, never
per-token Python), inside an Arrow-batched ``mapInPandas`` kernel that
emits exploded token rows with exact offsets. Offsets come from a
monotone left-to-right alignment (every Treebank rule only inserts
spaces between substrings of the original text, so each emitted token is
a verbatim substring and alignment is a single forward scan).

Scale: same contract and partitioning story as ``tokenize_arrow`` — no
shuffle, no window; the kernel is embarrassingly parallel per document.
"""

from __future__ import annotations

import re
from typing import Iterator, List, Tuple

from pyspark.sql import DataFrame

# --- the nltk 3.3 TreebankWordTokenizer rule chain (published) ----------

_STARTING_QUOTES = [
    (re.compile(r'^\"'), r"``"),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r"([ \(\[{<])(\"|\'{2})"), r"\1 `` "),
]

_PUNCTUATION = [
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.\.\."), r" ... "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    (re.compile(r'([^\.])(\.)([\]\)}>"\']*)\s*$'), r"\1 \2\3 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
]

_PARENS_BRACKETS = [(re.compile(r"[\]\[\(\)\{\}\<\>]"), r" \g<0> ")]

_DOUBLE_DASHES = [(re.compile(r"--"), r" -- ")]

_ENDING_QUOTES = [
    (re.compile(r'"'), " '' "),
    (re.compile(r"(\S)(\'\')"), r"\1 \2 "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]

# MacIntyreContractions (nltk 3.3)
_CONTRACTIONS2 = [
    re.compile(p)
    for p in (
        r"(?i)\b(can)(?#X)(not)\b",
        r"(?i)\b(d)(?#X)('ye)\b",
        r"(?i)\b(gim)(?#X)(me)\b",
        r"(?i)\b(gon)(?#X)(na)\b",
        r"(?i)\b(got)(?#X)(ta)\b",
        r"(?i)\b(lem)(?#X)(me)\b",
        r"(?i)\b(mor)(?#X)('n)\b",
        r"(?i)\b(wan)(?#X)(na)\s",
    )
]
_CONTRACTIONS3 = [
    re.compile(p) for p in (r"(?i) ('t)(?#X)(is)\b", r"(?i) ('t)(?#X)(was)\b")
]

_QUOTE_FINDER = re.compile(r"``|'{2}|\"")


def treebank_tokens(text: str) -> List[str]:
    """nltk 3.3 ``TreebankWordTokenizer.tokenize`` (convert_parentheses
    off, as the reference calls it)."""
    for regexp, substitution in _STARTING_QUOTES:
        text = regexp.sub(substitution, text)
    for regexp, substitution in _PUNCTUATION:
        text = regexp.sub(substitution, text)
    for regexp, substitution in _PARENS_BRACKETS:
        text = regexp.sub(substitution, text)
    for regexp, substitution in _DOUBLE_DASHES:
        text = regexp.sub(substitution, text)
    text = " " + text + " "
    for regexp, substitution in _ENDING_QUOTES:
        text = regexp.sub(substitution, text)
    for regexp in _CONTRACTIONS2:
        text = regexp.sub(r" \1 \2 ", text)
    for regexp in _CONTRACTIONS3:
        text = regexp.sub(r" \1 \2 ", text)
    return text.split()


def treebank_spans(text: str) -> List[Tuple[int, int]]:
    """nltk 3.3 ``span_tokenize``: tokenize, map converted quote tokens
    back to their raw source text, then align tokens left-to-right
    (nltk.tokenize.util.align_tokens)."""
    raw_tokens = treebank_tokens(text)
    if ('"' in text) or ("''" in text):
        matched = [m.group() for m in _QUOTE_FINDER.finditer(text)]
        tokens = [
            matched.pop(0) if tok in ('"', "``", "''") else tok
            for tok in raw_tokens
        ]
    else:
        tokens = raw_tokens
    point = 0
    offsets: List[Tuple[int, int]] = []
    for token in tokens:
        start = text.index(token, point)  # ValueError = alignment bug
        point = start + len(token)
        offsets.append((start, point))
    return offsets


def tokenize_treebank(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """documents(doc_id, text, ...) -> tokens(doc_id, token_idx, token,
    left, right) with Treebank segmentation and exact offsets.

    Same output contract as ``tokenize``/``tokenize_arrow`` (the fidelity
    invariant ``substring(text, left+1, right-left) == token`` holds), so
    it drops into every downstream operator unchanged.
    """
    import pandas as pd

    doc_id_type = documents.schema["doc_id"].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_tok, out_l, out_r = [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                if text is None:
                    continue
                for i, (l, r) in enumerate(treebank_spans(text)):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_tok.append(text[l:r])
                    out_l.append(l)
                    out_r.append(r)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype=pdf["doc_id"].dtype),
                    "token_idx": pd.Series(out_idx, dtype="int32"),
                    "token": pd.Series(out_tok, dtype="object"),
                    "left": pd.Series(out_l, dtype="int32"),
                    "right": pd.Series(out_r, dtype="int32"),
                }
            )

    return documents.select("doc_id", text_col).mapInPandas(
        kernel,
        f"doc_id {doc_id_type}, token_idx int, token string, left int, right int",
    )
