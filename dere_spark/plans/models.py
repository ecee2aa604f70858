"""Model artifact registry — S10/S11 (/root/reference/dere/__main__.py:68-79,
113-129; dere/models/_model.py:25-46).

The reference pickles a (task_spec, model_spec) header followed by model
parameters into one file; model classes are resolved by dotted name from a
JSON model spec. Here:

  * `save_model` writes a JSON manifest (model class dotted name, task
    spec path hash, params) + a pickle payload side by side — the manifest
    is human-readable lineage, the pickle is the broadcastable kernel
    model (operators/kernels.py dataclasses pickle cheaply);
  * `load_model` resolves the class by dotted name (the reference's
    pluggable-class mechanism, __main__.py:51-65) and unpickles;
  * on a cluster the directory lives on the object store; executors never
    read it — the DRIVER loads once and broadcasts (kernels pattern).
"""

from __future__ import annotations

import hashlib
import importlib
import json
import os
import pickle
import time
from typing import Any, Dict, Optional, Tuple


def _dotted_name(obj: Any) -> str:
    cls = obj.__class__
    return f"{cls.__module__}.{cls.__qualname__}"


def resolve_class(dotted: str) -> type:
    module_name, _, cls_name = dotted.rpartition(".")
    module = importlib.import_module(module_name)
    obj: Any = module
    for part in cls_name.split("."):
        obj = getattr(obj, part)
    return obj


def save_model(model: Any, path: str, metadata: Optional[Dict] = None) -> Dict:
    """Write model.pkl + manifest.json under `path`; returns the manifest."""
    os.makedirs(path, exist_ok=True)
    payload = pickle.dumps(model, protocol=pickle.HIGHEST_PROTOCOL)
    manifest = {
        "model_class": _dotted_name(model),
        "payload_md5": hashlib.md5(payload).hexdigest(),
        "payload_bytes": len(payload),
        "metadata": metadata or {},
        "saved_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(os.path.join(path, "model.pkl"), "wb") as f:
        f.write(payload)
    tmp = os.path.join(path, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(path, "manifest.json"))
    return manifest


def load_model(path: str, expected_class: Optional[str] = None) -> Tuple[Any, Dict]:
    """Load (model, manifest); verifies payload integrity and optionally
    the model class (corrupt or mismatched artifacts fail loudly)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    with open(os.path.join(path, "model.pkl"), "rb") as f:
        payload = f.read()
    got_md5 = hashlib.md5(payload).hexdigest()
    if got_md5 != manifest["payload_md5"]:
        raise ValueError(
            f"model payload corrupt: md5 {got_md5} != manifest {manifest['payload_md5']}"
        )
    if expected_class is not None and manifest["model_class"] != expected_class:
        raise ValueError(
            f"model class mismatch: {manifest['model_class']} != {expected_class}"
        )
    resolve_class(manifest["model_class"])  # import side effects / validation
    return pickle.loads(payload), manifest


def load_model_spec(path: str) -> Dict:
    """Model-spec JSON scan (S10) — the reference's model_spec reader
    (dere/__main__.py:118-127): parse the JSON and record ``__path__``
    so relative resources (e.g. the span classifier's gazetteer file)
    resolve relative to the spec file's directory."""
    with open(path) as f:
        spec = json.load(f)
    spec["__path__"] = path
    return spec


def model_spec_resource(spec: Dict, name: str) -> str:
    """Resolve a resource named in a model spec relative to the spec
    file's location (absolute paths pass through)."""
    if os.path.isabs(name):
        return name
    return os.path.join(os.path.dirname(os.path.abspath(spec["__path__"])), name)


def build_bare_model(task_spec_path: str, model_spec_path: str, out_dir: str) -> Dict:
    """The reference's `build` lifecycle step (dere/__main__.py:105-129):
    task spec + model spec -> INITIALIZED-but-untrained model artifact.

    For the baseline model spec (model_type BaselineModel) initialization
    means loading the span classifier's gazetteer file — the artifact is a
    ready-to-tag GazetteerTagger plus the spec lineage in metadata."""
    from collections import defaultdict

    from dere_spark.operators.kernels import GazetteerTagger
    from dere_spark.taskspec import load_task_spec

    load_task_spec(task_spec_path)  # validates; spec travels as metadata
    spec = load_model_spec(model_spec_path)
    gaz_name = (
        spec.get("params", {}).get("span_classifier", {}).get("gazetteer")
    )
    gazetteers: Dict[str, list] = defaultdict(list)
    gaz_path = None
    if gaz_name:
        gaz_path = model_spec_resource(spec, gaz_name)
        with open(gaz_path) as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                typ, surf = line.split(" ", 1)
                if typ[:1].isupper():
                    gazetteers[typ].append(surf.lower())
    model = GazetteerTagger(
        tuple(
            (typ, tuple(sorted(set(terms))))
            for typ, terms in sorted(gazetteers.items())
        )
    )
    return save_model(
        model,
        out_dir,
        metadata={
            "lifecycle": "bare",
            "model_type": spec.get("model_type"),
            "task_spec": os.path.abspath(task_spec_path),
            "model_spec": os.path.abspath(model_spec_path),
            "gazetteer": gaz_path,
        },
    )
