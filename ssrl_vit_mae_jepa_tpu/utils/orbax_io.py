"""Orbax checkpoint backend (optional alternative to the native zip format).

The native single-file format (``utils.checkpoint``) is the default —
fast, dependency-light, and easy to ship. Orbax adds async multi-host /
sharded-array checkpointing for large-scale runs; this module exposes the
same (state, meta) contract on top of ``orbax.checkpoint`` so the trainer
can swap backends. Directory layout: ``<path>/state`` (orbax) +
``<path>/meta.json``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple


def save_orbax(path: str | Path, state, meta: Optional[Dict[str, Any]] = None):
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    path.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "state", state, force=True)
    (path / "meta.json").write_text(json.dumps(meta or {}, default=str))
    return path


def load_orbax(path: str | Path, target=None) -> Tuple[Any, Dict[str, Any]]:
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            state = ckptr.restore(path / "state", target)
        else:
            state = ckptr.restore(path / "state")
    meta_file = path / "meta.json"
    meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
    return state, meta


def is_orbax_checkpoint(path: str | Path) -> bool:
    path = Path(path)
    return path.is_dir() and (path / "state").exists()
