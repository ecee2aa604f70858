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
