"""Checkpoint IO — the richest auxiliary subsystem of the reference (SURVEY.md §5.4).

Native format: a single ``.ckpt`` file = zip archive containing
``state.msgpack`` (flax-serialized pytree: params, opt_state, rng, counters)
and ``meta.json`` (epoch, global_step, ``callbacks.best_model_score``,
``hyper_parameters`` — mirroring the Lightning ckpt contract the reference's
tooling relies on, e.g. ``visualize_val_acc_by_mode.py:17-38``).

Policies (reference ``scripts/training/pretrain_mae.py:85-109``):
best-by-monitored-metric, last-every-epoch, periodic weights-only every N
epochs. Torch ``.pt``/``.ckpt`` files are detected by content and routed to
``utils.torch_interop`` by the callers.
"""

from __future__ import annotations

import json
import os
import zipfile
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np
from flax import serialization

FORMAT_KEY = "ssrl_vit_mae_jepa_tpu"
FORMAT_VERSION = 1


def save_checkpoint(path: str | Path, state, meta: Optional[Dict[str, Any]] = None):
    """Atomically write a native checkpoint file."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    meta = dict(meta or {})
    meta["__format__"] = FORMAT_KEY
    meta["__version__"] = FORMAT_VERSION
    state = jax_to_numpy(state)
    blob = serialization.to_bytes(state)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with zipfile.ZipFile(tmp, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr("state.msgpack", blob)
        zf.writestr("meta.json", json.dumps(meta, default=_json_default))
    os.replace(tmp, path)
    return path


def load_checkpoint(
    path: str | Path, target=None
) -> Tuple[Any, Dict[str, Any]]:
    """Load a native checkpoint → (state, meta).

    With ``target`` (a pytree of matching structure) the restored leaves keep
    target's structure/dtypes; without it the raw msgpack tree is returned
    (nested dicts — fine for params-only consumers).
    """
    path = Path(path)
    with zipfile.ZipFile(path, "r") as zf:
        meta = json.loads(zf.read("meta.json"))
        blob = zf.read("state.msgpack")
    if meta.get("__format__") != FORMAT_KEY:
        raise ValueError(f"{path} is not a {FORMAT_KEY} checkpoint")
    if target is not None:
        state = serialization.from_bytes(target, blob)
    else:
        state = serialization.msgpack_restore(blob)
    return state, meta


def is_native_checkpoint(path: str | Path) -> bool:
    try:
        with zipfile.ZipFile(path, "r") as zf:
            names = zf.namelist()
            if "meta.json" not in names:
                return False
            meta = json.loads(zf.read("meta.json"))
            return meta.get("__format__") == FORMAT_KEY
    except (zipfile.BadZipFile, FileNotFoundError, KeyError, ValueError):
        return False


def is_torch_checkpoint(path: str | Path) -> bool:
    """Torch zip-format (.pt/.ckpt) or legacy-pickle checkpoint detection."""
    path = Path(path)
    if not path.exists():
        return False
    if is_native_checkpoint(path):
        return False
    try:
        with zipfile.ZipFile(path, "r") as zf:
            return any(n.endswith("data.pkl") for n in zf.namelist())
    except zipfile.BadZipFile:
        with open(path, "rb") as f:
            magic = f.read(2)
        return magic[:1] == b"\x80"  # pickle protocol marker


def jax_to_numpy(tree):
    """Materialize a (possibly device-resident) pytree as host numpy."""
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)


def _json_default(o):
    if isinstance(o, (np.floating, np.integer)):
        return o.item()
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON serializable: {type(o)}")


class CheckpointCallbacks:
    """best / last / periodic checkpoint policy engine.

    Mirrors the three ModelCheckpoint callbacks of the reference pretrain CLI
    (``pretrain_mae.py:85-109``) and the monitor asymmetry (quirk Q10):
    pretrain monitors ``val_loss``/min, supervised training ``val_acc``/max.
    """

    def __init__(
        self,
        ckpt_dir: str | Path,
        monitor: str = "val_loss",
        mode: str = "min",
        periodic_every: Optional[int] = None,
        save_last: bool = True,
        backend: str = "native",
    ):
        self.ckpt_dir = Path(ckpt_dir)
        self.monitor = monitor
        self.mode = mode
        self.periodic_every = periodic_every
        self.save_last = save_last
        self.best_score: Optional[float] = None
        self.best_path: Optional[Path] = None
        if backend == "orbax":
            from ssrl_vit_mae_jepa_tpu.utils.orbax_io import save_orbax

            self._save = save_orbax
        elif backend == "native":
            self._save = save_checkpoint
        else:
            raise ValueError(f"unknown checkpoint backend {backend!r}")

    def record_epoch(self, epoch: int, metrics: Dict[str, float]) -> None:
        """Bookkeeping-only mirror of ``on_epoch_end`` for non-writing
        processes (multihost ranks > 0): metrics are globally reduced and
        identical on every process, so tracking best_score/best_path here
        keeps script-side reads (e.g. printing ``callbacks.best_path``)
        valid on every rank while only rank 0 touches the filesystem."""
        score = metrics.get(self.monitor)
        if score is not None and self._improved(float(score)):
            self.best_score = float(score)
            self.best_path = self.ckpt_dir / "best.ckpt"

    def _improved(self, score: float) -> bool:
        if self.best_score is None:
            return True
        return score < self.best_score if self.mode == "min" else score > self.best_score

    def on_epoch_end(
        self,
        epoch: int,
        metrics: Dict[str, float],
        state,
        meta_base: Dict[str, Any],
        weights_only_state=None,
    ) -> Dict[str, Any]:
        """Apply the checkpoint policies; returns {saved: [paths...]}.

        The device state is materialized to host numpy ONCE and reused by
        every policy write: best+last on an improved epoch would otherwise
        fetch the full params+optimizer tree twice — over the dev relay
        tunnel (~6 MB/s) that doubles a transfer that already rivals the
        epoch time.
        """
        import jax

        saved = []
        device_state = state
        state = jax_to_numpy(state)
        if weights_only_state is not None:
            # its leaves alias state's (trainer passes {"params": state.params})
            # — reuse the host copies by identity instead of re-fetching
            host_by_id = {
                id(d): h
                for d, h in zip(
                    jax.tree.leaves(device_state), jax.tree.leaves(state)
                )
            }
            # HARD aliasing contract: every weights_only leaf must be one of
            # state's jax.Array objects. Falling back to np.asarray here
            # would silently re-fetch the whole tree over the ~6 MB/s dev
            # relay, doubling the checkpoint transfer — fail loudly instead.
            missing = [
                x
                for x in jax.tree.leaves(weights_only_state)
                if id(x) not in host_by_id
            ]
            assert not missing, (
                f"{len(missing)} weights_only_state leaves do not alias the "
                "device state's leaves; pass subtrees of `state` itself "
                "(e.g. {'params': state.params}) so host copies are reused"
            )
            weights_only_state = jax.tree.map(
                lambda x: host_by_id[id(x)], weights_only_state
            )
        score = metrics.get(self.monitor)
        meta = dict(meta_base)
        meta.update(
            {
                "epoch": epoch,
                "metrics": {k: float(v) for k, v in metrics.items()},
                "callbacks": {
                    "monitor": self.monitor,
                    "mode": self.mode,
                    "best_model_score": self.best_score,
                },
            }
        )
        if score is not None and self._improved(float(score)):
            self.best_score = float(score)
            meta["callbacks"]["best_model_score"] = self.best_score
            p = self._save(self.ckpt_dir / "best.ckpt", state, meta)
            self.best_path = p
            saved.append(p)
        if self.save_last:
            saved.append(self._save(self.ckpt_dir / "last.ckpt", state, meta))
        if self.periodic_every and (epoch + 1) % self.periodic_every == 0:
            w_state = weights_only_state if weights_only_state is not None else state
            w_meta = dict(meta)
            w_meta["weights_only"] = weights_only_state is not None
            saved.append(
                self._save(
                    self.ckpt_dir / f"epoch-{epoch:03d}.ckpt", w_state, w_meta
                )
            )
        return {"saved": saved}
