"""E5/E6 — the legacy BioNLP shared-task scorer, complete semantics.

Re-expresses /root/reference/dere/evaluation/deRE_evaluation.py (E5) and
deRE_evaluation_usage.py (E6 — same engine, ``target`` slot instead of
``Theme``, sentiment classes, and a span-class fallback in eq_class) as a
per-document Arrow kernel plus a relational fold:

  * each document is scored independently (parse a1/a2 standoff, Equiv
    resolution, answer-side event dedup, all-pairs recursive event
    equality, per-file duplication adjustment) — embarrassingly parallel,
    one task per batch of docs, no shuffle;
  * the cross-corpus totals are a groupBy-sum monoid fold (A2) with
    precision/recall/F1 derived columns (A3).

Bug-for-bug fidelity notes (all verified against the reference source):

  * the dedup pass's topological sort extracts "dangling" event-arg ids
    with ``parts[1] for parts in arg.split(':')`` — ``parts`` is a STRING,
    so this collects single CHARACTERS ('h' from 'Theme', '5' from 'E5'),
    which never appear in the added-id set. Net observable behavior:
    events with no E-args are processed first in file order, then every
    event WITH E-args takes the "circular reference" path and is appended
    in file order (deRE_evaluation.py:113-138). We reproduce that order
    directly.
  * the equiv re-canonicalization loop inside dedup rebinds the loop
    variable and never writes back (deRE_evaluation.py:143-150) — a no-op;
    args are equiv-canonicalized ONLY at parse time, with whatever Equiv
    lines have been seen so far. Reproduced by simply not re-canonicalizing.
  * span-section matching (count_match_span) compares OFFSETS ONLY — a
    span of one class may match a gold span of another class; per-class
    attribution uses each side's own class (deRE_evaluation.py:709-777).
  * duplication adjustment is per FILE, per class: spans clamp
    matched_answer to matched_gold; events additionally subtract the
    excess from the answer denominator (deRE_evaluation.py:879-924).
  * gold events are never deduped (mode G); answer events are (mode A).
  * Theme2..Theme6 normalize to Theme at parse (usage: target2..target6).
  * M-lines become pseudo-frames [type, " ", ["Theme:<aid>"]] and are
    counted/matched/deduped like events (class check + args, no span).
"""

from __future__ import annotations

import re
from typing import Dict, Iterator, List, Optional, Sequence, Set, Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# Target class lists from the two scorer CLIs
BIONLP_EVENT_CLASSES = [
    "Gene_expression", "Transcription", "Protein_catabolism",
    "Phosphorylation", "Localization",
]
BIONLP_REG_CLASSES = ["Regulation", "Positive_regulation", "Negative_regulation"]
BIONLP_MOD_CLASSES = ["Negation", "Speculation"]
BIONLP_TARGET_CLASSES = (
    BIONLP_EVENT_CLASSES + ["Binding"] + BIONLP_REG_CLASSES + BIONLP_MOD_CLASSES
)
USAGE_TARGET_CLASSES = ["positive", "negative", "neutral"]

_MAX_EQ_DEPTH = 64  # recursion guard; the reference would RecursionError


def _parse_a1(a1_text: str) -> Tuple[Dict[str, list], Set[int]]:
    spans: Dict[str, list] = {}
    marked: Set[int] = set()
    for line in (a1_text or "").splitlines():
        line = line.strip()
        if not line:
            continue
        parts = line.split("\t")
        if len(parts) < 2 or not parts[0].startswith("T"):
            continue
        cur_type, beg, end = parts[1].split(" ")
        beg_i, end_i = int(beg), int(end)
        marked.update(range(beg_i, end_i))
        spans[parts[0]] = [cur_type, beg_i, end_i]
    return spans, marked


def _parse_a2(
    a2_text: str,
    marked: Set[int],
    equiv: Dict[str, str],
    mode: str,
    theme_slot: str = "Theme",
) -> Tuple[Dict[str, list], Dict[str, list], Dict[str, int], Dict[str, int]]:
    """Returns (span_annotations, frame_annotations, num_event, num_span).

    ``marked`` and ``equiv`` are mutated (the reference threads them
    through gold parse -> answer parse). mode 'A' runs event dedup.
    """
    theme_multi = re.compile(r"^%s[2-6]$" % theme_slot)
    span_ann: Dict[str, list] = {}
    frame_ann: Dict[str, list] = {}
    span_list: List[list] = []
    for line in (a2_text or "").splitlines():
        line = line.strip()
        if not line:
            continue
        parts = line.split("\t")
        cur_id = parts[0]
        exp = parts[1] if len(parts) > 1 else ""
        if cur_id.startswith("T"):
            cur_type, beg, end = exp.split(" ")
            beg_i, end_i = int(beg), int(end)
            if mode == "G":
                marked.update(range(beg_i, end_i))
            span_ann[cur_id] = [cur_type, beg_i, end_i]
            span_list.append([cur_id, cur_type, beg_i, end_i])
        elif cur_id.startswith("E"):
            pieces = exp.split(" ")
            t_type, t_id = pieces.pop(0).split(":")
            args = []
            for item in pieces:
                if item == "":
                    continue
                a_type, a_id = item.split(":")
                a_type = theme_multi.sub(theme_slot, a_type)
                a_id = equiv.get(a_id, a_id)
                args.append(a_type + ":" + a_id)
            frame_ann[cur_id] = [t_type, t_id, args]
        elif cur_id.startswith("M"):
            cur_type, aid = exp.split(" ")
            frame_ann[cur_id] = [cur_type, " ", [theme_slot + ":" + aid]]
        elif cur_id.startswith("*"):
            pieces = exp.split(" ")
            rep, others = pieces[1], pieces[2:]
            for o in others:
                equiv[o] = rep

    if mode == "A":
        _dedup_answer_events(frame_ann, equiv)

    num_event: Dict[str, int] = {}
    for fid in frame_ann:
        num_event[frame_ann[fid][0]] = num_event.get(frame_ann[fid][0], 0) + 1
    num_span: Dict[str, int] = {}
    for _, cur_type, _, _ in span_list:
        num_span[cur_type] = num_span.get(cur_type, 0) + 1
    return span_ann, frame_ann, num_event, num_span


def _dedup_answer_events(frame_ann: Dict[str, list], equiv: Dict[str, str]) -> None:
    """Answer-side exact-duplicate removal (deRE_evaluation.py:100-175).

    Processing order replicates the reference's observable behavior (see
    module docstring). The reference's topological-sort pass iterates a
    worklist with ``for r in remain: ... remain.remove(r)`` — CPython's
    list iterator keeps a bare index, so each removal shifts the tail left
    and the next fetch SKIPS one element. With five no-E-arg events the
    visit order is therefore E1, E3, E5 (pass 1) then E2, E4 (pass 2), not
    file order — and since dedup keeps the FIRST-visited event of each
    expression, a duplicate at an even file position survives over its
    odd-position twin. Events WITH E-args are never removed in this pass
    (the dangling check can never succeed for them — the char-indexing
    bug), so they stall the worklist and are flushed via the "circular
    reference" path in remaining (file) order. We simulate the skip
    semantics with an explicit cursor. The first-visited event with a
    given (type, trigger, args) expression wins; later duplicates are
    deleted and recorded in equiv."""
    has_e_arg = {
        fid: any(re.search(r"\:E[0-9-]+$", a) for a in frame_ann[fid][2])
        for fid in frame_ann
    }
    ordered: List[str] = []
    worklist = list(frame_ann)
    while worklist:
        removed_any = False
        # cursor model of `for r in lst: lst.remove(r)`: fetch at j, pop
        # shifts the tail, unconditional j+=1 then skips the new lst[j]
        j = 0
        while j < len(worklist):
            fid = worklist[j]
            if not has_e_arg[fid]:
                ordered.append(fid)
                worklist.pop(j)
                removed_any = True
            j += 1
        if not removed_any:  # only E-arg events left: the "circular" flush
            ordered.extend(worklist)
            worklist = []
    seen_expr: Dict[str, str] = {}
    for fid in ordered:
        t_type, t_id, args = frame_ann[fid]
        key = t_type + "," + t_id + "," + ",".join(args)
        if key in seen_expr:
            equiv[fid] = seen_expr[key]
            del frame_ann[fid]
        else:
            seen_expr[key] = fid


def _expand_span(
    beg: int, end: int, text: str, marked: Set[int]
) -> Tuple[int, int]:
    """Exact expand_span (deRE_evaluation.py:495-517): widen up to 2 chars
    each side, then to the nearest boundary char or marked (trigger/given)
    position."""
    boundary = (" ", ".", "!", "?", ",", "'", '"')
    text_len = len(text)
    ebeg = beg - 2
    while ebeg >= 0 and text[ebeg:ebeg + 1] not in boundary and ebeg not in marked:
        ebeg -= 1
    ebeg += 1
    eend = end + 2
    while (
        eend <= text_len
        and text[eend - 1:eend] not in boundary
        and (eend - 1) not in marked
    ):
        eend += 1
    eend -= 1
    return ebeg, eend


class _DocMatcher:
    """All equality predicates over one document's parsed annotations."""

    def __init__(
        self,
        a1: Dict[str, list],
        a_span: Dict[str, list],
        a_frame: Dict[str, list],
        g_span: Dict[str, list],
        g_frame: Dict[str, list],
        text: str,
        marked: Set[int],
        soft_span: bool,
        soft_overlap: bool,
        soft_class: bool = False,
        soft_args: bool = False,
        span_class_fallback: bool = False,
        theme_slot: str = "Theme",
    ) -> None:
        self.theme_slot = theme_slot
        self.a1 = a1
        self.a_span = a_span
        self.a_frame = a_frame
        self.g_span = g_span
        self.g_frame = g_frame
        self.text = text
        self.marked = marked
        self.soft_span = soft_span
        self.soft_overlap = soft_overlap
        self.soft_class = soft_class
        self.soft_args = soft_args
        self.span_class_fallback = span_class_fallback

    @staticmethod
    def _soften(cls: str) -> str:
        cls = re.sub(r"^Positive\_r", "R", cls)
        cls = re.sub(r"^Negative\_r", "R", cls)
        cls = re.sub(r"^Transcription$", "Gene_expression", cls)
        return cls

    def eq_class(self, aid: str, gid: str) -> bool:
        if aid in self.a1:
            return aid == gid
        if aid in self.a_frame:
            acls, gcls = self.a_frame[aid][0], self.g_frame[gid][0]
        elif self.span_class_fallback and aid in self.a_span:
            # E6 usage variant: entity args carry their span class
            if gid not in self.g_span:
                return False
            acls, gcls = self.a_span[aid][0], self.g_span[gid][0]
        else:
            return False
        if self.soft_class:
            acls, gcls = self._soften(acls), self._soften(gcls)
        return acls == gcls

    def _bounds(self, xid: str, span: Dict[str, list], frame: Dict[str, list]):
        if xid.startswith("T"):
            rec = span.get(xid)
        elif xid.startswith("E"):
            fr = frame.get(xid)
            rec = span.get(fr[1]) if fr else None
        else:
            rec = None
        return (rec[1], rec[2]) if rec else (-1, -1)

    def eq_span(self, aid: str, gid: str) -> bool:
        if aid.startswith("T") and aid in self.a1:
            return aid == gid
        abeg, aend = self._bounds(aid, self.a_span, self.a_frame)
        gbeg, gend = self._bounds(gid, self.g_span, self.g_frame)
        if abeg < 0 or gbeg < 0:
            return False
        if self.soft_overlap:
            return (abeg <= gbeg <= aend) or (gbeg <= abeg <= gend)
        if self.soft_span:
            gbeg, gend = _expand_span(gbeg, gend, self.text, self.marked)
            return abeg >= gbeg and aend <= gend
        return abeg == gbeg and aend == gend

    def eq_args(self, aid: str, gid: str, depth: int) -> bool:
        ae = self.a_frame[aid][2]
        ge = self.g_frame[gid][2]
        if self.soft_args:
            # trim trailing non-theme args (reference mutates; we copy).
            # The pattern follows the matcher's theme slot so the usage
            # variant trims '^target:' (deRE_evaluation_usage.py:403-405),
            # not a hardcoded 'Theme'.
            theme_pat = re.compile(r"^%s\:" % re.escape(self.theme_slot))
            ae = list(ae)
            ge = list(ge)
            while ae and not theme_pat.search(ae[-1]):
                ae.pop()
            while ge and not theme_pat.search(ge[-1]):
                ge.pop()
        if len(ae) != len(ge):
            return False
        for a_item, g_item in zip(ae, ge):  # ordered comparison
            aatype, aaid = a_item.split(":")
            gatype, gaid = g_item.split(":")
            if not self.soft_args and aatype != gatype:
                return False
            if aaid[0] != gaid[0]:  # both events or both entities
                return False
            if aaid.startswith("E"):
                if not self.eq_revent(aaid, gaid, depth + 1):
                    return False
            elif aaid.startswith("T"):
                if not (self.eq_class(aaid, gaid) and self.eq_span(aaid, gaid)):
                    return False
        return True

    def eq_revent(self, aid: str, gid: str, depth: int) -> bool:
        if depth > _MAX_EQ_DEPTH:
            return False  # cycle guard (reference would blow the stack)
        if not (aid.startswith("E") and gid.startswith("E")):
            return False
        if aid not in self.a_frame or gid not in self.g_frame:
            return False
        return (
            self.eq_class(aid, gid)
            and self.eq_span(aid, gid)
            and self.eq_args(aid, gid, depth)
        )

    def eq_event(self, aid: str, gid: str) -> bool:
        if aid.startswith("E"):
            return (
                self.eq_class(aid, gid)
                and self.eq_span(aid, gid)
                and self.eq_args(aid, gid, 0)
            )
        if aid.startswith("M"):
            if gid not in self.g_frame:
                return False
            return self.eq_class(aid, gid) and self.eq_args(aid, gid, 0)
        return False


def score_document(
    text: str,
    a1_text: str,
    gold_a2: str,
    answer_a2: str,
    target_classes: Sequence[str],
    soft_span: bool = False,
    soft_overlap_span: bool = False,
    theme_slot: str = "Theme",
    span_class_fallback: bool = False,
) -> Dict[Tuple[str, str], List[int]]:
    """One file's scores, duplication-adjusted, keyed by (class, kind) ->
    [n_gold, matched_gold, n_answer, matched_answer]."""
    a1, marked = _parse_a1(a1_text)
    equiv: Dict[str, str] = {}
    g_span, g_frame, num_gold, num_gold_span = _parse_a2(
        gold_a2, marked, equiv, "G", theme_slot
    )
    a_span, a_frame, num_answer, num_answer_span = _parse_a2(
        answer_a2, marked, equiv, "A", theme_slot
    )
    m = _DocMatcher(
        a1, a_span, a_frame, g_span, g_frame, text, marked,
        soft_span, soft_overlap_span, span_class_fallback=span_class_fallback,
        theme_slot=theme_slot,
    )

    # --- span section: offsets-only all-pairs matching ---
    m_answer_span: Dict[str, int] = {}
    m_gold_span: Dict[str, int] = {}
    gold_t = [k for k in g_span]
    matched_gold_ids: Set[str] = set()
    for aid in a_span:
        hit = False
        for gid in gold_t:
            if m.eq_span(aid, gid):
                hit = True
                matched_gold_ids.add(gid)
        if hit:
            cls = a_span[aid][0]
            m_answer_span[cls] = m_answer_span.get(cls, 0) + 1
    for gid in matched_gold_ids:
        cls = g_span[gid][0]
        m_gold_span[cls] = m_gold_span.get(cls, 0) + 1
    for cl in target_classes:  # per-file duplication adjustment (spans)
        ma, mg = m_answer_span.get(cl, 0), m_gold_span.get(cl, 0)
        if ma > mg:
            m_answer_span[cl] = mg

    # --- event section: all-pairs recursive matching ---
    m_answer: Dict[str, int] = {}
    m_gold: Dict[str, int] = {}
    matched_gold_frames: Set[str] = set()
    for aid in a_frame:
        hit = False
        for gid in g_frame:
            if m.eq_event(aid, gid):
                hit = True
                matched_gold_frames.add(gid)
        if hit:
            cls = a_frame[aid][0]
            m_answer[cls] = m_answer.get(cls, 0) + 1
    for gid in matched_gold_frames:
        cls = g_frame[gid][0]
        m_gold[cls] = m_gold.get(cls, 0) + 1
    for cl in target_classes:  # per-file duplication adjustment (events)
        ma, mg = m_answer.get(cl, 0), m_gold.get(cl, 0)
        if ma > mg:
            excess = ma - mg
            num_answer[cl] = num_answer.get(cl, 0) - excess
            m_answer[cl] = ma - excess

    out: Dict[Tuple[str, str], List[int]] = {}
    for cl in target_classes:
        out[(cl, "span")] = [
            num_gold_span.get(cl, 0),
            m_gold_span.get(cl, 0) if cl in num_gold_span else 0,
            num_answer_span.get(cl, 0),
            m_answer_span.get(cl, 0) if cl in num_answer_span else 0,
        ]
        out[(cl, "event")] = [
            num_gold.get(cl, 0),
            m_gold.get(cl, 0) if cl in num_gold else 0,
            num_answer.get(cl, 0),
            m_answer.get(cl, 0) if cl in num_answer else 0,
        ]
    return out


def legacy_event_scores(
    docs: DataFrame,
    target_classes: Optional[Sequence[str]] = None,
    soft_span: bool = False,
    soft_overlap_span: bool = False,
    variant: str = "bionlp",
) -> DataFrame:
    """docs(doc_id, text, a1, gold_a2, answer_a2) -> per-class scores.

    Output: (kind, type_name, n_gold, matched_gold, n_answer,
    matched_answer, precision, recall, f1) — percentages like the
    reference's report (get_scores, deRE_evaluation.py:200-211). The
    per-document kernel applies the per-file duplication adjustment; the
    fold is a plain sum, so the result equals the reference CLI run over
    the same file set."""
    import pandas as pd

    if variant == "bionlp":
        classes = list(target_classes or BIONLP_TARGET_CLASSES)
        theme, fallback = "Theme", False
    elif variant == "usage":
        classes = list(target_classes or USAGE_TARGET_CLASSES)
        theme, fallback = "target", True
    else:
        raise ValueError(f"unknown variant: {variant}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                scored = score_document(
                    r.text or "", r.a1 or "", r.gold_a2 or "",
                    r.answer_a2 or "", classes,
                    soft_span=soft_span, soft_overlap_span=soft_overlap_span,
                    theme_slot=theme, span_class_fallback=fallback,
                )
                for (cl, kind), (ng, mg, na, ma) in scored.items():
                    rows.append((kind, cl, ng, mg, na, ma))
            yield pd.DataFrame(
                rows,
                columns=[
                    "kind", "type_name", "n_gold", "matched_gold",
                    "n_answer", "matched_answer",
                ],
            )

    per_doc = docs.select("doc_id", "text", "a1", "gold_a2", "answer_a2").mapInPandas(
        kernel,
        "kind string, type_name string, n_gold long, matched_gold long, "
        "n_answer long, matched_answer long",
    )
    agg = per_doc.groupBy("kind", "type_name").agg(
        F.sum("n_gold").alias("n_gold"),
        F.sum("matched_gold").alias("matched_gold"),
        F.sum("n_answer").alias("n_answer"),
        F.sum("matched_answer").alias("matched_answer"),
    )
    precision = F.when(
        F.col("n_answer") > 0, F.col("matched_answer") * 100.0 / F.col("n_answer")
    ).otherwise(F.lit(0.0))
    recall = F.when(
        F.col("n_gold") > 0, F.col("matched_gold") * 100.0 / F.col("n_gold")
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        (precision + recall) > 0, 2 * precision * recall / (precision + recall)
    ).otherwise(F.lit(0.0))
    return agg.select(
        "*",
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
    )


def load_legacy_pairs(
    spark: SparkSession, gold_dir: str, hypo_dir: str
) -> DataFrame:
    """Pair up gold (.txt/.a1/.a2 or .a2.t1) and hypothesis (.a2/.ann)
    directories into the scorer's per-document input frame. Whole-file
    reads, one row per doc — the reference CLI's glob loop, distributed."""
    import glob as globmod

    from dere_spark.sources.brat import _read_whole_files

    def read(ext: str, d: str) -> Optional[DataFrame]:
        if not globmod.glob(f"{d}/*.{ext}"):
            return None
        return _read_whole_files(spark, f"{d}/*.{ext}", ext)

    txt = read("txt", gold_dir)
    if txt is None:
        raise FileNotFoundError(
            f"score-legacy: no *.txt document files in gold dir {gold_dir!r}"
        )
    txt = txt.withColumnRenamed("content", "text")
    a1 = read("a1", gold_dir)
    if a1 is None:
        a1 = txt.select("doc_id", F.lit("").alias("a1"))
    else:
        a1 = a1.withColumnRenamed("content", "a1")
    gold = read("a2.t1", gold_dir) or read("a2", gold_dir)  # CLI reads .a2.t1
    if gold is None:
        raise FileNotFoundError(
            f"score-legacy: no *.a2.t1 or *.a2 gold annotation files in {gold_dir!r}"
        )
    gold = gold.withColumnRenamed("content", "gold_a2")
    # the reference CLI globs *.a2 AND *.ann together for hypotheses
    # (deRE_evaluation.py:795) — an either/or fallback would silently
    # drop every .ann document from a mixed-extension directory. When a
    # doc ships BOTH extensions, .a2 wins (documented deviation: the
    # reference would score the pmid twice).
    h_a2, h_ann = read("a2", hypo_dir), read("ann", hypo_dir)
    if h_a2 is None and h_ann is None:
        raise FileNotFoundError(
            f"score-legacy: no *.a2 or *.ann hypothesis files in {hypo_dir!r}"
        )
    if h_a2 is not None and h_ann is not None:
        hypo = h_a2.unionByName(h_ann.join(h_a2, "doc_id", "left_anti"))
    else:
        hypo = h_a2 if h_a2 is not None else h_ann
    hypo = hypo.withColumnRenamed("content", "answer_a2")
    return (
        txt.join(a1, "doc_id", "left")
        .join(gold, "doc_id", "left")
        .join(hypo, "doc_id", "inner")
        .select("doc_id", "text", "a1", "gold_a2", "answer_a2")
    )


def render_legacy_report(scores: DataFrame, variant: str = "bionlp") -> str:
    """The reference CLI's report, byte-compatible layout
    (deRE_evaluation.py:213-244 report/report_headline; section structure
    :938-1063): SPAN EVALUATION over the target classes (minus the
    modification classes), then EVENT EVALUATION grouped SVT / Binding /
    REG with running totals. Driver-side rendering of the tiny per-class
    aggregate (the fold stays distributed)."""
    rows = {
        (r["kind"], r["type_name"]): (
            int(r["n_gold"]), int(r["matched_gold"]),
            int(r["n_answer"]), int(r["matched_answer"]),
        )
        for r in scores.collect()
    }

    def get(kind: str, cl: str):
        return rows.get((kind, cl), (0, 0, 0, 0))

    def fmt(cl, g, mg, a, ma):
        p = (ma / a * 100) if a > 0 else 0.0
        r = (mg / g * 100) if g > 0 else 0.0
        f1 = (2 * p * r / (p + r)) if (p + r) > 0 else 0.0
        gold_col = f"{g} ({mg})"
        ans_col = f"{a} ({ma})"
        return (
            cl.ljust(20) + "\t" + gold_col.ljust(10) + "\t" + ans_col.ljust(10)
            + "\t" + str(round(r, 2)) + "\t" + str(round(p, 2)) + "\t"
            + str(round(f1, 2))
        )

    out = [
        "Class".ljust(20) + "\t" + "gold (match)".ljust(10) + "\t"
        + "answer (match)".ljust(10) + "\t" + "recall \t prec. \t fscore"
    ]

    def section(title, kind, classes, total_label, carry=(0, 0, 0, 0)):
        tg = tmg = ta = tma = 0
        for cl in classes:
            g, mg, a, ma = get(kind, cl)
            out.append(fmt(cl, g, mg, a, ma))
            tg += g; tmg += mg; ta += a; tma += ma
        cg, cmg, ca, cma = carry
        out.append(fmt(total_label, tg + cg, tmg + cmg, ta + ca, tma + cma))
        out.append("----------------------------------------------")
        return (tg + cg, tmg + cmg, ta + ca, tma + cma)

    if variant == "usage":
        out.append("-------------- SPAN EVALUATION ------------------")
        section("span", "span", USAGE_TARGET_CLASSES, "=[TOTAL]=")
        out.append("-------------- EVENT EVALUATION ------------------")
        # the usage scorer labels its event total '=[EVENT-TOTAL]=',
        # unlike the bionlp scorer's '=[ALL-TOTAL]'
        # (deRE_evaluation_usage.py:990 vs deRE_evaluation.py:1055)
        section("event", "event", USAGE_TARGET_CLASSES, "=[EVENT-TOTAL]=")
        return "\n".join(out)

    out.append("-------------- SPAN EVALUATION ------------------")
    span_classes = [
        c for c in BIONLP_TARGET_CLASSES if c not in BIONLP_MOD_CLASSES
    ]
    section("span", "span", span_classes, "=[TOTAL]=")
    out.append("-------------- EVENT EVALUATION ------------------")
    svt = section("svt", "event", BIONLP_EVENT_CLASSES, "=[SVT-TOTAL]=")
    evt = section("evt", "event", ["Binding"], "=[EVT-TOTAL]=", carry=svt)
    reg = section("reg", "event", BIONLP_REG_CLASSES, "=[REG-TOTAL]=")
    g = evt[0] + reg[0]; mg = evt[1] + reg[1]
    a = evt[2] + reg[2]; ma = evt[3] + reg[3]
    out.append(fmt("=[ALL-TOTAL]", g, mg, a, ma))
    out.append("----------------------------------------------")
    return "\n".join(out)
