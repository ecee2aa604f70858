"""Task-spec loader semantics, checked against all shipped reference specs
(read-only fixtures) plus our webtext spec — mirrors the contract of the
reference's two-pass loader (dere/taskspec.py:83-152)."""

from __future__ import annotations

import glob

import pytest

from dere_spark.plans import compile_plan
from dere_spark.taskspec import FrameType, SpanType, load_task_spec
from dere_spark.webtext import SPEC_PATH

REFERENCE_SPECS = sorted(glob.glob("/root/reference/task-specs/*.xml"))


def test_webtext_spec_loads():
    spec = load_task_spec(SPEC_PATH)
    assert {t.name for t in spec.span_types} == {"Operator", "Object", "Qualifier"}
    op = spec.frame_type("Operation")
    assert op is not None
    # anchor convention: first slot is the anchor
    assert op.anchor_slot.name == "Operation"
    theme = op.slot("Theme")
    assert theme.min_cardinality == 1 and theme.max_cardinality == 1
    manner = op.slot("Manner")
    assert manner.min_cardinality == 0 and manner.max_cardinality == 1


@pytest.mark.parametrize("path", REFERENCE_SPECS)
def test_reference_specs_load(path):
    spec = load_task_spec(path)
    assert spec.span_types and spec.frame_types
    for ft in spec.frame_types:
        assert ft.slot_types, f"{ft.name} has no slots"


def test_bionlpst_recursive_frames():
    spec = load_task_spec("/root/reference/task-specs/bionlpst.xml")
    reg = spec.frame_type("Regulation")
    theme = reg.slot("Theme")
    # Theme is union-typed over Protein span and the three regulation
    # *span* types... per the spec prefix rules, unprefixed names prefer
    # span types; recursion shows up via frame-typed fillers elsewhere.
    assert any(isinstance(t, SpanType) for t in theme.types)
    # prefix lookup honors span:/frame: disambiguation
    assert isinstance(spec.type_lookup("frame:Regulation"), FrameType)
    assert isinstance(spec.type_lookup("span:Regulation"), SpanType)
    # name-only lookup prefers span types (reference order of checks)
    assert isinstance(spec.type_lookup("Regulation"), SpanType)


def test_compile_plan_whitelist():
    plan = compile_plan(load_task_spec(SPEC_PATH))
    assert plan.anchor_span_types == {"Operation": "Operator"}
    assert ("Operator", "Object") in plan.plausible_relations
    assert ("Operator", "Qualifier") in plan.plausible_relations
    preds = {lab.predicate for lab in plan.relation_labels}
    assert preds == {"Operation.Theme", "Operation.Manner"}


def test_compile_plan_bionlp():
    plan = compile_plan(load_task_spec("/root/reference/task-specs/bionlpst.xml"))
    # every frame type is anchored at its same-named trigger span type
    assert plan.anchor_span_types["Gene_expression"] == "Gene_expression"
    # (Gene_expression, Protein) must be a plausible anchor/filler pair
    labels = plan.plausible_relations[("Gene_expression", "Protein")]
    assert any(l.predicate == "Gene_expression.Theme" for l in labels)


# ---------------------------------------------------------------------------
# Structural (DTD-equivalent) validation — reference task-specs/dere.dtd via
# task-specs/validator.py:15-44 (VERDICT r3 missing #5)
# ---------------------------------------------------------------------------

def _write(tmp_path, body: str) -> str:
    p = tmp_path / "bad.xml"
    p.write_text(body)
    return str(p)


def test_structure_all_shipped_specs_valid():
    """All 6 shipped reference specs pass the structural check (they are
    DTD-valid upstream)."""
    from dere_spark.taskspec import load_task_spec

    for path in REFERENCE_SPECS:
        load_task_spec(path)  # must not raise


def test_structure_unknown_element(tmp_path):
    import pytest

    from dere_spark.taskspec import TaskSpecStructureError, load_task_spec

    p = _write(
        tmp_path,
        '<deREschema name="x" version="0" author="a">'
        "<gadgets/></deREschema>",
    )
    with pytest.raises(TaskSpecStructureError, match="gadgets"):
        load_task_spec(p)


def test_structure_missing_required_attribute(tmp_path):
    import pytest

    from dere_spark.taskspec import TaskSpecStructureError, load_task_spec

    p = _write(
        tmp_path,
        '<deREschema name="x" version="0" author="a">'
        '<spans><span name="T"/></spans></deREschema>',  # predict missing
    )
    with pytest.raises(TaskSpecStructureError, match="predict"):
        load_task_spec(p)


def test_structure_unknown_attribute(tmp_path):
    import pytest

    from dere_spark.taskspec import TaskSpecStructureError, load_task_spec

    p = _write(
        tmp_path,
        '<deREschema name="x" version="0" author="a">'
        '<spans><span name="T" predict="True" color="red"/></spans>'
        "</deREschema>",
    )
    with pytest.raises(TaskSpecStructureError, match="color"):
        load_task_spec(p)


def test_structure_cardinality_sanity(tmp_path):
    import pytest

    from dere_spark.taskspec import TaskSpecStructureError, load_task_spec

    base = (
        '<deREschema name="x" version="0" author="a">'
        '<spans><span name="T" predict="True"/></spans>'
        '<frames><frame name="E">{slot}</frame></frames></deREschema>'
    )
    p = _write(
        tmp_path, base.format(slot='<slot name="S" types="T" cardinality="two"/>')
    )
    with pytest.raises(TaskSpecStructureError, match="not an integer"):
        load_task_spec(p)
    p = _write(
        tmp_path,
        base.format(
            slot='<slot name="S" types="T" mincardinality="3" maxcardinality="1"/>'
        ),
    )
    with pytest.raises(TaskSpecStructureError, match="mincardinality 3 > maxcardinality 1"):
        load_task_spec(p)


def test_structure_empty_element_with_children(tmp_path):
    import pytest

    from dere_spark.taskspec import TaskSpecStructureError, load_task_spec

    p = _write(
        tmp_path,
        '<deREschema name="x" version="0" author="a">'
        '<spans><span name="T" predict="True"><oops/></span></spans>'
        "</deREschema>",
    )
    with pytest.raises(TaskSpecStructureError, match="EMPTY"):
        load_task_spec(p)


def test_structure_predict_value_must_be_exact(tmp_path):
    """predict='true' would silently load as False (the reference matches
    'True' case-sensitively) — the validator rejects the ambiguity."""
    import pytest

    from dere_spark.taskspec import TaskSpecStructureError, load_task_spec

    p = _write(
        tmp_path,
        '<deREschema name="x" version="0" author="a">'
        '<spans><span name="T" predict="true"/></spans></deREschema>',
    )
    with pytest.raises(TaskSpecStructureError, match="exactly 'True'"):
        load_task_spec(p)


def test_structure_frame_name_required(tmp_path):
    """The DTD marks frame name #IMPLIED but both loaders read it
    unconditionally — the validator requires it so a nameless frame fails
    with a clear message instead of a KeyError."""
    import pytest

    from dere_spark.taskspec import TaskSpecStructureError, load_task_spec

    p = _write(
        tmp_path,
        '<deREschema name="x" version="0" author="a">'
        '<spans><span name="T" predict="True"/></spans>'
        "<frames><frame><slot name=\"S\" types=\"T\"/></frame></frames>"
        "</deREschema>",
    )
    with pytest.raises(TaskSpecStructureError, match="missing required"):
        load_task_spec(p)


def test_structure_mixed_cardinality_forms_rejected(tmp_path):
    """cardinality + min/maxcardinality together is ambiguous: the loader
    (like the reference) lets cardinality override, so a spec mixing both
    would validate as one reading and load as another."""
    import pytest

    from dere_spark.taskspec import TaskSpecStructureError, load_task_spec

    p = _write(
        tmp_path,
        '<deREschema name="x" version="0" author="a">'
        '<spans><span name="T" predict="True"/></spans>'
        '<frames><frame name="F">'
        '<slot name="S" types="T" cardinality="1" maxcardinality="2"/>'
        "</frame></frames></deREschema>",
    )
    with pytest.raises(TaskSpecStructureError, match="mixes"):
        load_task_spec(p)
