"""Single point of coupling to the reference checkout's shipped DATA files
(task specs, the span-model gazetteer). These are read as data, never as
code. The root is overridable via ``DERE_SPARK_REFERENCE_ROOT`` so
relocating the checkout is a one-line environment change (ADVICE r3)."""

from __future__ import annotations

import os

REFERENCE_ROOT = os.environ.get("DERE_SPARK_REFERENCE_ROOT", "/root/reference")

#: the shipped BioNLP-ST task spec (reference task-specs/bionlpst.xml)
BIONLP_SPEC = os.path.join(REFERENCE_ROOT, "task-specs", "bionlpst.xml")

#: the reference's shipped span-model gazetteer (its model spec,
#: model-specs/bionlpst-baseline.json, points the span classifier here)
REFERENCE_GAZETTEER = os.path.join(
    REFERENCE_ROOT, "model-specs", "training_gazetteer_bionlp"
)
