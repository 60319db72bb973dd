"""AOT export + serving: ship the model as a versioned StableHLO artifact.

The reference's deployment story is "install the whole torch/MONAI/
Lightning stack and run predict_whs.py" (predict_whs.py:35-114) — the
model only exists as Python code + a pickle.  TPU-natively the compiled
program IS the deployable unit: `jax.export` lowers the jitted window
forward once, serializes it (StableHLO + calling convention, versioned
for compatibility windows), and a server deserializes and calls it —
no model code, no flax, no config parsing at serving time.  Cross-
platform lowering means a CPU host can produce a TPU artifact.

Bundle layout (a directory):
    meta.json      roi / out_channels / overlap / dtypes / platforms /
                   jax version — everything the serving side needs
    window_fn.jax  serialized `jax.export.Exported`:
                   (params, window [B,*roi,Cin], modalities i32[B]) -> logits
    params.ckpt    weights in the native msgpack checkpoint format
                   (kept OUTSIDE the program: baking multi-hundred-MB
                   constants into HLO is a measured compile pathology —
                   see CLAUDE.md / inferers.py)

Serving reuses the sliding-window machinery: `ServedModel.predict` wraps
the deserialized program in the same `SlidingWindowInferer` (an
`Exported.call` is traceable, so the whole tile->predict->blend loop
still compiles to ONE device program around the imported module).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .inferers import SlidingWindowInferer
from .models import model_from_config
from .train.checkpoint import load_checkpoint, save_checkpoint

_BUNDLE_VERSION = 1
_FN_FILE = "window_fn.jax"
_PARAMS_FILE = "params.ckpt"
_META_FILE = "meta.json"


def _window_fn(model, compute_dtype):
    """(params, window, modalities) -> f32 logits — the serving forward,
    mirroring train.engine.Trainer.apply_fn's precision policy."""

    def fn(params, window, modalities):
        p = jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
        logits = model.apply({"params": p},
                             window.astype(compute_dtype), modalities,
                             train=False)
        return logits.astype(jnp.float32)

    return fn


def export_bundle(cfg: Config, params, out_dir: str | Path,
                  platforms: tuple[str, ...] = ("tpu", "cpu"),
                  sw_batch_size: int | None = None) -> Path:
    """Export `cfg`'s model + `params` as a serving bundle at `out_dir`.

    `platforms` lists every backend the artifact must run on; lowering is
    ahead-of-time, so a TPU artifact can be produced on a CPU-only host.
    The window batch dim is fixed to `sw_batch_size` (default: the
    config's) — serving shapes are static by design, like every jitted
    shape in this framework.
    """
    from jax import export as jexport

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    model = model_from_config(cfg)
    compute = jnp.bfloat16 if cfg.amp else jnp.float32
    bs = int(sw_batch_size or cfg.sw_batch_size)
    in_ch = int(cfg.in_channels)

    # plain nested-dict host copies: the pytree STRUCTURE is part of the
    # exported calling convention, and load_bundle restores a plain dict.
    # Params are stored ALREADY in the compute dtype: the serving side
    # never updates them, so shipping f32 masters would double the
    # artifact and leave a live params cast inside the exported program
    # (with compute-dtype params the in-program cast is an identity and
    # folds away).
    from flax import serialization
    params = serialization.to_state_dict(jax.tree.map(
        lambda x: np.asarray(x).astype(np.dtype(compute))
        if jnp.issubdtype(np.asarray(x).dtype, jnp.floating)
        else np.asarray(x), params))
    p_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        params)
    w_spec = jax.ShapeDtypeStruct((bs, *cfg.roi, in_ch), np.float32)
    m_spec = jax.ShapeDtypeStruct((bs,), np.int32)

    exported = jexport.export(jax.jit(_window_fn(model, compute)),
                              platforms=list(platforms))(
                                  p_spec, w_spec, m_spec)
    (out / _FN_FILE).write_bytes(exported.serialize())
    save_checkpoint(out / _PARAMS_FILE, params=params)
    meta = {
        "bundle_version": _BUNDLE_VERSION,
        "platforms": list(platforms),
        "roi": list(cfg.roi),
        "in_channels": in_ch,
        "out_channels": int(cfg.out_channels),
        "sw_batch_size": bs,
        "infer_overlap": float(cfg.infer_overlap),
        "spacing": [float(s) for s in cfg.spacing],
        "compute_dtype": np.dtype(compute).name,
        "params_dtype": np.dtype(compute).name,
        "jax_version": jax.__version__,
        "model_name": cfg.model_name,
    }
    (out / _META_FILE).write_text(json.dumps(meta, indent=2))
    return out


class ServedModel:
    """A deserialized bundle: window-level `__call__` + volume-level
    `predict` (sliding-window, same blend semantics as training eval)."""

    def __init__(self, exported, params, meta: dict):
        self._exported = exported
        self.params = params
        self.meta = meta
        self._inferers: dict = {}

    def __call__(self, window, modalities):
        return self._exported.call(self.params, jnp.asarray(window),
                                   jnp.asarray(modalities, jnp.int32))

    def predict(self, volume, modalities, *, overlap: float | None = None,
                mode: str = "gaussian"):
        """Sliding-window inference over a whole volume `[B, *spatial, C]`.

        The imported program is traceable, so the inferer compiles its
        usual single tile->predict->blend program around it.
        """
        key = (float(self.meta["infer_overlap"] if overlap is None
                     else overlap), mode)
        if key not in self._inferers:
            self._inferers[key] = SlidingWindowInferer(
                lambda pv, w, m: self._exported.call(pv, w, m),
                roi_size=tuple(self.meta["roi"]),
                sw_batch_size=int(self.meta["sw_batch_size"]),
                overlap=key[0], mode=mode,
                out_channels=int(self.meta["out_channels"]))
        mods = jnp.asarray(modalities, jnp.int32)
        return self._inferers[key](jnp.asarray(volume), mods, self.params)


def load_bundle(bundle_dir: str | Path) -> ServedModel:
    """Load a serving bundle — no model code or Config required."""
    from jax import export as jexport

    d = Path(bundle_dir)
    meta = json.loads((d / _META_FILE).read_text())
    if meta.get("bundle_version", 0) > _BUNDLE_VERSION:
        raise ValueError(f"bundle version {meta['bundle_version']} is newer "
                         f"than this runtime supports ({_BUNDLE_VERSION})")
    exported = jexport.deserialize((d / _FN_FILE).read_bytes())
    params = load_checkpoint(d / _PARAMS_FILE)["params"]
    params = jax.tree.map(jnp.asarray, params)
    return ServedModel(exported, params, meta)
