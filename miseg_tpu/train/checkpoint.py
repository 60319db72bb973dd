"""Checkpointing: best/last + top-k, msgpack-serialized param/opt pytrees.

Reference parity (SURVEY §5 checkpoint/resume):
  * raw `.pt` dicts `{epoch, best_acc, state_dict, optimizer, scheduler,
    scaler}` written as best.pt/last.pt per trial (tune.py:27-38) →
    `save_checkpoint`/`load_checkpoint` with the same logical fields
    (no scaler — bf16 needs none);
  * PTL ModelCheckpoint(monitor='val/accuracy/avg', mode=max,
    save_top_k=3, save_last=True) (train.py:37-44) → `CheckpointManager`.

Format: flax.serialization msgpack of the pytree + a small JSON sidecar —
dependency-free, host-portable, and layout-stable for `partial_load`.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def save_checkpoint(path: str | Path, *, params, opt_state=None, epoch: int = 0,
                    best_acc: float = 0.0, scheduler_state: dict | None = None,
                    extra: dict | None = None) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "params": serialization.to_state_dict(_to_host(params)),
        "opt_state": (serialization.to_state_dict(_to_host(opt_state))
                      if opt_state is not None else {}),
    }
    blob = serialization.msgpack_serialize(payload)
    meta = {"epoch": epoch, "best_acc": float(best_acc),
            "scheduler": scheduler_state or {}, "extra": extra or {}}
    with open(path, "wb") as f:
        f.write(blob)
    with open(str(path) + ".json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str | Path, *, params_template=None,
                    opt_state_template=None) -> dict:
    path = Path(path)
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = {}
    if os.path.exists(str(path) + ".json"):
        with open(str(path) + ".json") as f:
            meta = json.load(f)
    out = {"params": payload["params"], "opt_state": payload.get("opt_state"),
           **meta}
    if params_template is not None:
        out["params"] = serialization.from_state_dict(params_template,
                                                      payload["params"])
    if opt_state_template is not None and payload.get("opt_state"):
        out["opt_state"] = serialization.from_state_dict(opt_state_template,
                                                         payload["opt_state"])
    return out


def load_any_checkpoint_params(path: str | Path, params: dict) -> dict:
    """Merge a checkpoint into params: ours (msgpack) or a reference torch
    .pt/.ckpt (auto-detected; translated via train.torch_import)."""
    from .pretrained import partial_load
    try:
        ck = load_checkpoint(path)
        return partial_load(params, ck["params"])
    except Exception:
        from .torch_import import load_reference_checkpoint
        return load_reference_checkpoint(path, params)


class CheckpointManager:
    """Top-k (by monitored metric) + last checkpoint management.

    Top-k state is persisted in a `manager.json` sidecar (and restored on
    construction) so that best_path and stale-file pruning survive a resume,
    matching PTL ModelCheckpoint's persisted state (train.py:37-44).
    """

    def __init__(self, directory: str | Path, monitor: str = "val/accuracy/avg",
                 mode: str = "max", save_top_k: int = 3):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self._topk: list[tuple[float, str]] = []
        self._restore_state()

    @property
    def _state_path(self) -> Path:
        return self.dir / "manager.json"

    def _restore_state(self) -> None:
        if not self._state_path.exists():
            return
        try:
            with open(self._state_path) as f:
                state = json.load(f)
        except (OSError, json.JSONDecodeError):
            return
        # A sidecar recorded under a DIFFERENT monitored metric or mode is
        # incomparable — start the top-k record fresh rather than ranking
        # mixed metrics against each other.
        if (state.get("monitor", self.monitor) != self.monitor
                or state.get("mode", self.mode) != self.mode):
            print(f"CheckpointManager: discarding persisted top-k recorded "
                  f"for monitor={state.get('monitor')!r}/mode="
                  f"{state.get('mode')!r} (now {self.monitor!r}/{self.mode!r})")
            return
        # Keep only entries whose checkpoint files still exist on disk.
        self._topk = [(float(m), p) for m, p in state.get("topk", [])
                      if os.path.exists(p)]

    def _persist_state(self) -> None:
        tmp = str(self._state_path) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"monitor": self.monitor, "mode": self.mode,
                       "topk": self._topk}, f)
        os.replace(tmp, self._state_path)

    @property
    def best_path(self) -> str | None:
        if not self._topk:
            return None
        best = max(self._topk) if self.mode == "max" else min(self._topk)
        return best[1]

    def save(self, metric: float, *, params, opt_state=None, epoch: int = 0,
             scheduler_state=None, extra=None) -> None:
        name = f"epoch{epoch:05d}-{metric:.4f}.ckpt"
        path = self.dir / name
        save_checkpoint(path, params=params, opt_state=opt_state, epoch=epoch,
                        best_acc=metric, scheduler_state=scheduler_state,
                        extra=extra)
        self._topk.append((metric, str(path)))
        reverse = self.mode == "max"
        self._topk.sort(key=lambda t: t[0], reverse=reverse)
        while len(self._topk) > self.save_top_k:
            _, drop = self._topk.pop()
            for p in (drop, drop + ".json"):
                if os.path.exists(p):
                    os.remove(p)
        save_checkpoint(self.dir / "last.ckpt", params=params,
                        opt_state=opt_state, epoch=epoch, best_acc=metric,
                        scheduler_state=scheduler_state, extra=extra)
        self._persist_state()
