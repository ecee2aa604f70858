"""dere_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the declarative slot-filling semantics of
the reference system (DeRE, EMNLP'18 demo; see /root/reference) as staged,
vectorized Spark DataFrame plans:

    documents -> instances -> tokens -> spans -> candidate pairs
              -> frames -> entity-linked (subj, pred, obj) triples

Design principles (see SURVEY.md):
  * DataFrame/SQL first — Catalyst plans everything relational; whole-stage
    codegen for the hot path; Arrow pandas UDFs only for genuine kernels.
  * Task schemas (span types, frames with anchor slot + typed slots) are
    compiled on the driver into the DataFrame plan, never shipped as data.
  * Doc-partitioned everything: every stage is embarrassingly parallel over
    documents, so the plan scales by adding executors.
"""

__version__ = "0.1.0"

from dere_spark.taskspec import (  # noqa: F401
    FrameType,
    SlotType,
    SpanType,
    TaskSpecification,
    load_task_spec,
)
