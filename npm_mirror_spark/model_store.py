"""Tiny model registry: the trained artifacts this engine produces
(logreg weight vectors, k-means centroids, BPE merge lists) are
kilobytes of plain data — the right store is a JSON document committed
atomically (tmp + rename, the snapshot_store discipline), NOT a binary
blob format.  Versioned by subdirectory so releases can pin the exact
model that gated them (build_release's quality_model).

Scale note: models here are driver-side by design (every trainer in
this repo reduces to k x dim or dim+1 numbers); anything bigger than
memory belongs in a parquet table, not this store.
"""

from __future__ import annotations

import json
import os
import tempfile


def save_model(path: str, model: dict, kind: str = "model") -> str:
    """Atomically write ``model`` (JSON-serializable) to ``path``.
    Returns the final path.  Crash-safe: a torn write can never be
    observed (tmp file + rename on the same filesystem)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"kind": kind, "model": model}
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(path) or ".", suffix=".tmp"
    )
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return path


def load_model(path: str, kind: str | None = None) -> dict:
    """Read a model back; optionally assert its ``kind`` (loading BPE
    merges where logreg weights are expected should fail loudly, not
    produce garbage scores)."""
    with open(path) as f:
        payload = json.load(f)
    if kind is not None and payload.get("kind") != kind:
        raise ValueError(
            f"model at {path} is kind={payload.get('kind')!r}, expected {kind!r}"
        )
    model = payload["model"]
    # JSON turns merge tuples into lists; restore tuples for BPE ranks
    if payload.get("kind") == "bpe" and "merges" in model:
        model["merges"] = [tuple(m) for m in model["merges"]]
    return model
