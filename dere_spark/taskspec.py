"""Task-schema system: the declarative core of the engine.

A task specification declares *what* to extract — span types (mentions to
detect or take as given), frame types (typed relations anchored at a trigger
span), and typed, cardinality-bounded slots. The engine compiles a spec into
a staged DataFrame plan; the spec itself never leaves the driver.

Semantics mirror the reference's schema system
(/root/reference/dere/taskspec.py:7-152): frozen dataclasses, frame types
hashed/equated by name only, slot `types` a union over span and frame types
(frames may recursively fill slots of other frames), per-slot cardinality
bounds with ``None`` = unbounded, and a two-pass XML loader whose first pass
builds a symbol table of all span/frame names so the second pass can resolve
forward and recursive references. The ``span:``/``frame:`` name-prefix
convention in lookups is preserved.

This is a fresh implementation — no code is taken from the reference.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple, Union


@dataclass(frozen=True)
class SpanType:
    """A mention type. ``predict=False`` marks *given* input (visible to
    models); ``predict=True`` marks types the engine must detect.
    (reference: dere/taskspec.py:7-10)"""

    name: str
    predict: bool


@dataclass(frozen=True)
class FrameType:
    """A typed relation ("event"). Identity is the name alone so that the
    two-pass loader can create the object first and patch ``slot_types`` in
    once all symbols exist. (reference: dere/taskspec.py:13-30)

    Anchor convention: the FIRST slot is the anchor — the trigger span that
    lexically anchors the frame in text (reference:
    dere/models/_baseline/slot_classifier.py:273-275)."""

    name: str
    slot_types: Tuple["SlotType", ...] = field(default_factory=tuple)

    def slot(self, name: str) -> Optional["SlotType"]:
        for st in self.slot_types:
            if st.name == name:
                return st
        return None

    @property
    def anchor_slot(self) -> "SlotType":
        return self.slot_types[0]

    def __hash__(self) -> int:
        return hash(self.name)

    def __eq__(self, other: Any) -> bool:
        if not isinstance(other, FrameType):
            return NotImplemented
        return self.name == other.name


@dataclass(frozen=True)
class SlotType:
    """A named, typed edge-set of a frame. ``types`` is a union type over
    SpanTypes and FrameTypes; cardinality bounds are inclusive and ``None``
    means unbounded. (reference: dere/taskspec.py:33-38)"""

    name: str
    types: Tuple[Union[FrameType, SpanType], ...]
    min_cardinality: Optional[int] = 1
    max_cardinality: Optional[int] = 1


_SPAN_PREFIX = "span:"
_FRAME_PREFIX = "frame:"


@dataclass(frozen=True)
class TaskSpecification:
    """The full declared schema. Lookup helpers accept the optional
    ``span:`` / ``frame:`` disambiguating prefixes, matching the reference
    convention (dere/taskspec.py:41-79)."""

    span_types: Tuple[SpanType, ...]
    frame_types: Tuple[FrameType, ...]

    def span_type(self, name: str) -> Optional[SpanType]:
        if name.startswith(_SPAN_PREFIX):
            name = name[len(_SPAN_PREFIX):]
        return next((t for t in self.span_types if t.name == name), None)

    def frame_type(self, name: str) -> Optional[FrameType]:
        if name.startswith(_FRAME_PREFIX):
            name = name[len(_FRAME_PREFIX):]
        return next((t for t in self.frame_types if t.name == name), None)

    def type_lookup(self, name: str) -> Optional[Union[SpanType, FrameType]]:
        want_span = want_frame = True
        if name.startswith(_SPAN_PREFIX):
            name, want_frame = name[len(_SPAN_PREFIX):], False
        elif name.startswith(_FRAME_PREFIX):
            name, want_span = name[len(_FRAME_PREFIX):], False
        if want_span:
            t = next((t for t in self.span_types if t.name == name), None)
            if t is not None:
                return t
        if want_frame:
            return next((t for t in self.frame_types if t.name == name), None)
        return None

    @property
    def target_span_types(self) -> Tuple[SpanType, ...]:
        """Span types the engine must detect (predict=True)."""
        return tuple(t for t in self.span_types if t.predict)

    @property
    def given_span_types(self) -> Tuple[SpanType, ...]:
        return tuple(t for t in self.span_types if not t.predict)


def _parse_bool(s: str) -> bool:
    return s == "True"


class TaskSpecStructureError(ValueError):
    """A spec file violates the schema's structural rules (the DTD the
    reference ships: task-specs/dere.dtd + validator.py:15-44)."""


#: element -> (required attrs, optional attrs); content rules are coded in
#: validate_task_spec_structure. Mirrors task-specs/dere.dtd.
_DTD_ATTRS = {
    "deREschema": ({"name", "version", "author"}, set()),
    "spans": (set(), set()),
    "frames": (set(), set()),
    "span": ({"name", "predict"}, set()),
    # the DTD marks frame name #IMPLIED, but BOTH loaders (reference
    # taskspec.py:110 and ours) unconditionally read attrib["name"] — the
    # validator exists to catch that before the KeyError, so it requires it
    "frame": ({"name"}, set()),
    "slot": (
        {"name", "types"},
        {"cardinality", "mincardinality", "maxcardinality"},
    ),
}

_DTD_CHILDREN = {
    "deREschema": {"spans", "frames"},
    "spans": {"span"},
    "frames": {"frame"},
    "frame": {"slot"},
    "span": set(),  # EMPTY
    "slot": set(),  # EMPTY
}


def validate_task_spec_structure(root: "ET.Element", path: str = "<spec>") -> None:
    """Structural validation equivalent to the reference's DTD check
    (task-specs/dere.dtd via task-specs/validator.py): unknown elements and
    attributes are rejected with the offending name, EMPTY elements may not
    have children, required attributes must be present, and cardinality
    attributes must be non-negative integers with min <= max. Runs before
    semantic loading so a malformed spec fails with a clear message instead
    of a KeyError deep in symbol resolution."""

    def fail(msg: str) -> None:
        raise TaskSpecStructureError(f"{path}: {msg}")

    if root.tag != "deREschema":
        fail(f"root element must be <deREschema>, found <{root.tag}>")

    def walk(el: "ET.Element") -> None:
        if el.tag not in _DTD_ATTRS:
            fail(f"unknown element <{el.tag}>")
        required, optional = _DTD_ATTRS[el.tag]
        missing = required - set(el.attrib)
        if missing:
            fail(
                f"<{el.tag}> missing required attribute(s) "
                + ", ".join(sorted(missing))
            )
        unknown = set(el.attrib) - required - optional
        if unknown:
            fail(
                f"<{el.tag}> has unknown attribute(s) "
                + ", ".join(sorted(unknown))
            )
        allowed = _DTD_CHILDREN[el.tag]
        for child in el:
            if child.tag not in allowed:
                if not allowed:
                    fail(f"<{el.tag}> is EMPTY but contains <{child.tag}>")
                fail(
                    f"<{el.tag}> may only contain "
                    + "|".join(f"<{t}>" for t in sorted(allowed))
                    + f", found <{child.tag}>"
                )
            walk(child)
        if el.tag == "span":
            v = el.attrib["predict"]
            # the reference loader (taskspec.py:97-101) treats EXACTLY
            # "True" as true and anything else as false — so a spec
            # writing predict="true" would silently load as a GIVEN
            # type; reject the ambiguity here instead
            if v not in ("True", "False"):
                fail(
                    f"<span name={el.attrib.get('name', '?')!r}> "
                    f"predict={v!r} must be exactly 'True' or 'False' "
                    f"(the reference matches 'True' case-sensitively and "
                    f"silently treats everything else as False)"
                )
        if el.tag == "slot":
            bounds = {}
            for attr in ("cardinality", "mincardinality", "maxcardinality"):
                if attr in el.attrib:
                    try:
                        v = int(el.attrib[attr])
                    except ValueError:
                        fail(
                            f"<slot name={el.attrib.get('name', '?')!r}> "
                            f"{attr}={el.attrib[attr]!r} is not an integer"
                        )
                    if v < 0:
                        fail(
                            f"<slot name={el.attrib.get('name', '?')!r}> "
                            f"{attr}={v} is negative"
                        )
                    bounds[attr] = v
            # the loaders (reference taskspec.py:138-144 and ours) let a
            # bare `cardinality` OVERRIDE explicit min/max because it is
            # checked last — a spec mixing both forms would validate
            # against one reading and load as another; reject the mix
            if "cardinality" in bounds and (
                "mincardinality" in bounds or "maxcardinality" in bounds
            ):
                fail(
                    f"<slot name={el.attrib.get('name', '?')!r}> mixes "
                    f"cardinality with mincardinality/maxcardinality — "
                    f"the loader would silently let cardinality override; "
                    f"use one form"
                )
            lo = bounds.get("mincardinality", bounds.get("cardinality"))
            hi = bounds.get("maxcardinality", bounds.get("cardinality"))
            if lo is not None and hi is not None and lo > hi:
                fail(
                    f"<slot name={el.attrib.get('name', '?')!r}> "
                    f"mincardinality {lo} > maxcardinality {hi}"
                )

    walk(root)


def load_task_spec(path: str) -> TaskSpecification:
    """Two-pass XML loader (semantics of dere/taskspec.py:83-152).

    Pass 1 registers every span and frame name in a symbol table (frames as
    empty shells); pass 2 resolves each slot's ``types`` attribute — a
    comma-separated list of names, optionally ``span:``/``frame:`` prefixed —
    against that table, which is what allows frames to reference frames
    declared later (recursive schemas like BioNLP Regulation).

    Cardinality attributes: ``cardinality`` sets both bounds;
    ``mincardinality``/``maxcardinality`` set each independently; an absent
    attribute means unbounded (``None``).
    """
    # os.path.exists is False for members of a --py-files zip; fall back
    # to reading through the import system so specs ship inside the
    # package artifact (spark-submit --py-files dere_spark.zip)
    import os

    if os.path.exists(path):
        root = ET.parse(path).getroot()
    else:
        import importlib.resources as _res

        marker = os.sep + "dere_spark" + os.sep
        if marker in path:
            rel = path.split(marker, 1)[1]
            data = (
                _res.files("dere_spark").joinpath(rel.replace(os.sep, "/")).read_bytes()
            )
            root = ET.fromstring(data.decode("utf-8"))
        else:
            root = ET.parse(path).getroot()  # surface the original error

    validate_task_spec_structure(root, path)

    span_types: Dict[str, SpanType] = {}
    frame_types: Dict[str, FrameType] = {}
    symbols: Dict[str, Union[SpanType, FrameType]] = {}

    for section in root:
        if section.tag == "spans":
            for el in section:
                if el.tag != "span":
                    continue
                st = SpanType(el.attrib["name"], _parse_bool(el.attrib["predict"]))
                span_types[st.name] = st
                symbols[st.name] = st
                symbols[_SPAN_PREFIX + st.name] = st
        elif section.tag == "frames":
            for el in section:
                if el.tag != "frame":
                    continue
                ft = FrameType(el.attrib["name"])
                frame_types[ft.name] = ft
                symbols[ft.name] = ft
                symbols[_FRAME_PREFIX + ft.name] = ft

    for section in root:
        if section.tag != "frames":
            continue
        for el in section:
            if el.tag != "frame":
                continue
            slots: List[SlotType] = []
            for slot_el in el:
                type_names = [n.strip() for n in slot_el.attrib["types"].split(",")]
                filler_types = tuple(symbols[n] for n in type_names)
                min_card: Optional[int] = None
                max_card: Optional[int] = None
                if "mincardinality" in slot_el.attrib:
                    min_card = int(slot_el.attrib["mincardinality"])
                if "maxcardinality" in slot_el.attrib:
                    max_card = int(slot_el.attrib["maxcardinality"])
                if "cardinality" in slot_el.attrib:
                    min_card = max_card = int(slot_el.attrib["cardinality"])
                slots.append(SlotType(slot_el.attrib["name"], filler_types, min_card, max_card))
            shell = frame_types[el.attrib["name"]]
            object.__setattr__(shell, "slot_types", tuple(slots))

    return TaskSpecification(tuple(span_types.values()), tuple(frame_types.values()))
