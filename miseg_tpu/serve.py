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
    window_fn_baked.jax   optional (--export_bake_params): same program
                   with the weights baked as module constants — the
                   every-shape fallback then keeps the constant-folded
                   ~1.0x steady state (the argument form measures 0.83x)
    params.ckpt    weights in the native msgpack checkpoint format
                   (kept OUTSIDE the program: baking multi-hundred-MB
                   constants into HLO is a measured compile pathology —
                   see CLAUDE.md / inferers.py)
    volume_<DxHxW>.jax/.npz   optional: the WHOLE sliding-window program
                   (pad → tile → predict → blend → crop) exported for a
                   canonical volume shape, plus its blend tables
                   (window starts / importance / normalizer — device
                   ARGUMENTS, never HLO constants)

Serving reuses the sliding-window machinery: `ServedModel.predict` wraps
the deserialized program in the same `SlidingWindowInferer` (an
`Exported.call` is traceable, so the whole tile->predict->blend loop
still compiles to ONE device program around the imported module).

The steady-state story, measured on v5e (round 4, scripts/bench_serve.py):
the exported artifact runs at 0.83× the live model REGARDLESS of whether
the export boundary sits at the window or the whole volume — and a live
control arm that merely passes params as jit ARGUMENTS measures the same
0.83×.  The whole gap is the calling convention: weights XLA sees as
literals get constant-folded / pre-laid-out; weights passed as arguments
cannot be.  Hence `bake_params=True` (`--export_bake_params`): volume
programs with the weights embedded as module constants measure 0.999×
live with bit-identical output, at the cost of a weights-sized artifact
and a live-model-sized first compile.  The default (argument) convention
keeps the 7× AOT startup win and the 0.83× steady state — pick per
deployment: short-lived batch jobs want the argument form, long-running
servers want the baked form.  Volume-level exports additionally remove
the interior module boundary from the per-window loop (a prerequisite
for constant-folding to reach the loop at all) and are the only form
`bake_params` applies to.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .inferers import SlidingWindowInferer
from .models import model_from_config
from .train.checkpoint import load_checkpoint, save_checkpoint

_BUNDLE_VERSION = 1
_FN_FILE = "window_fn.jax"
_FN_BAKED_FILE = "window_fn_baked.jax"
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
                  sw_batch_size: int | None = None,
                  volume_shapes: Sequence[Sequence[int]] = (),
                  volume_mode: str = "gaussian",
                  bake_params: bool = False) -> Path:
    """Export `cfg`'s model + `params` as a serving bundle at `out_dir`.

    `platforms` lists every backend the artifact must run on; lowering is
    ahead-of-time, so a TPU artifact can be produced on a CPU-only host.
    The window batch dim is fixed to `sw_batch_size` (default: the
    config's) — serving shapes are static by design, like every jitted
    shape in this framework.

    `volume_shapes` lists canonical volume spatial shapes (e.g.
    `[(224, 224, 224)]`) to additionally export WHOLE sliding-window
    programs for (blend mode `volume_mode`, overlap from the config) —
    `ServedModel.predict` routes matching volumes through these.

    `bake_params=True` embeds the weights in the volume programs as
    module CONSTANTS instead of call arguments.  Measured on v5e (round
    4): with params as arguments the steady state is 0.83× the live
    model — the loss is the calling convention itself, not the export
    module boundary (a live params-as-arg control arm measures the same
    0.83×) — because XLA can only constant-fold / pre-lay-out weights it
    sees as literals.  Baking restores 1.0× steady state; the costs are
    a weights-sized artifact per program and a live-model-sized first
    compile (the AOT startup win applies to the argument convention).
    With `bake_params=True` a baked WINDOW program is exported too
    (window_fn_baked.jax), so the every-shape fallback path also keeps
    the ~1.0x steady state; the argument-form window_fn.jax still ships
    alongside as the fast-startup path.
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

    wfn = _window_fn(model, compute)
    exported = jexport.export(jax.jit(wfn),
                              platforms=list(platforms))(
                                  p_spec, w_spec, m_spec)
    (out / _FN_FILE).write_bytes(exported.serialize())
    save_checkpoint(out / _PARAMS_FILE, params=params)
    if bake_params:
        # baked WINDOW program: weights as module constants, signature
        # (window, modalities) -> logits.  This is the every-shape serving
        # path — the generic inferer traces it for volumes that match no
        # exported volume program, so long-running servers at arbitrary
        # shapes keep the ~1.0x constant-folded steady state instead of
        # the measured 0.83x params-as-arguments convention (round 4,
        # scripts/bench_serve.py).  The argument-form window_fn.jax still
        # ships as the fast-startup / low-memory path.
        const_p = jax.tree.map(jnp.asarray, params)
        wfn_baked = lambda w, m: wfn(const_p, w, m)
        exported_b = jexport.export(jax.jit(wfn_baked),
                                    platforms=list(platforms))(
                                        w_spec, m_spec)
        (out / _FN_BAKED_FILE).write_bytes(exported_b.serialize())

    volume_programs = []
    for spatial in volume_shapes:
        spatial = tuple(int(s) for s in spatial)
        inferer = SlidingWindowInferer(
            lambda p, w, m: wfn(p, w, m), roi_size=tuple(cfg.roi),
            sw_batch_size=bs, overlap=float(cfg.infer_overlap),
            mode=volume_mode, out_channels=int(cfg.out_channels))
        full, starts, imp, count = inferer.program(spatial)
        specs = [jax.ShapeDtypeStruct((1, *spatial, in_ch), np.float32),
                 jax.ShapeDtypeStruct((1,), np.int32),
                 jax.ShapeDtypeStruct(starts.shape, np.int32),
                 jax.ShapeDtypeStruct(imp.shape, np.float32),
                 jax.ShapeDtypeStruct(count.shape, np.float32)]
        if bake_params:
            const_p = jax.tree.map(jnp.asarray, params)
            fn_v = lambda v, m, s, i, c, _p=const_p: full(_p, v, m, s, i, c)
        else:
            fn_v, specs = full, [p_spec] + specs
        exported_v = jexport.export(jax.jit(fn_v),
                                    platforms=list(platforms))(*specs)
        tag = "x".join(str(s) for s in spatial)
        (out / f"volume_{tag}.jax").write_bytes(exported_v.serialize())
        np.savez(out / f"volume_{tag}.npz",
                 starts=np.asarray(starts, np.int32),
                 imp=np.asarray(imp, np.float32),
                 count=np.asarray(count, np.float32))
        volume_programs.append({
            "tag": tag, "spatial": list(spatial), "batch": 1,
            "mode": volume_mode, "overlap": float(cfg.infer_overlap),
            "params_baked": bool(bake_params),
        })

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
        "window_baked": bool(bake_params),
        "volume_programs": volume_programs,
    }
    (out / _META_FILE).write_text(json.dumps(meta, indent=2))
    return out


class ServedModel:
    """A deserialized bundle: window-level `__call__` + volume-level
    `predict` (sliding-window, same blend semantics as training eval)."""

    def __init__(self, exported, params, meta: dict,
                 bundle_dir: Path | None = None, exported_baked=None):
        self._exported = exported
        self._exported_baked = exported_baked  # weights as constants
        self.params = params
        self.meta = meta
        self._bundle_dir = Path(bundle_dir) if bundle_dir else None
        self._inferers: dict = {}
        self._volume_fns: dict = {}  # tag -> (Exported, starts, imp, count)
        self._fallbacks_logged: set = set()

    def __call__(self, window, modalities):
        if self._exported_baked is not None:
            return self._exported_baked.call(
                jnp.asarray(window), jnp.asarray(modalities, jnp.int32))
        return self._exported.call(self.params, jnp.asarray(window),
                                   jnp.asarray(modalities, jnp.int32))

    def _volume_program(self, spatial, batch, overlap, mode):
        """A matching whole-volume exported program, or None."""
        for entry in self.meta.get("volume_programs", ()):
            if (tuple(entry["spatial"]) == tuple(spatial)
                    and entry["batch"] == batch and entry["mode"] == mode
                    and abs(entry["overlap"] - overlap) < 1e-9):
                tag = entry["tag"]
                if tag not in self._volume_fns:
                    if self._bundle_dir is None:
                        return None
                    try:
                        from jax import export as jexport
                        exp = jexport.deserialize(
                            (self._bundle_dir
                             / f"volume_{tag}.jax").read_bytes())
                        aux = np.load(self._bundle_dir / f"volume_{tag}.npz")
                        # ONE jitted wrapper per program: the f32 upcast and
                        # the exported call must live inside a single jit —
                        # eager per-call ops cost a full host↔device RTT
                        # each on remote backends.  Baked programs carry
                        # their weights as module constants and take no
                        # params argument (accepted-and-ignored here so
                        # predict() has one calling convention).
                        if entry.get("params_baked"):
                            fn = jax.jit(lambda p, v, m, s, i, c, _e=exp:
                                         _e.call(v.astype(jnp.float32),
                                                 m, s, i, c))
                        else:
                            fn = jax.jit(lambda p, v, m, s, i, c, _e=exp:
                                         _e.call(p, v.astype(jnp.float32),
                                                 m, s, i, c))
                        self._volume_fns[tag] = (
                            fn, jnp.asarray(aux["starts"]),
                            jnp.asarray(aux["imp"]), jnp.asarray(aux["count"]))
                    except (FileNotFoundError, OSError) as e:
                        # partially-copied bundle: meta lists a volume
                        # program whose files are missing — degrade to the
                        # always-correct window-level path
                        import warnings
                        warnings.warn(f"volume program {tag} unusable "
                                      f"({e}); falling back to the "
                                      "window-level inferer")
                        self._volume_fns[tag] = None
                return self._volume_fns[tag]
        return None

    def predict(self, volume, modalities, *, overlap: float | None = None,
                mode: str = "gaussian"):
        """Sliding-window inference over a whole volume `[B, *spatial, C]`.

        Volumes whose (spatial shape, overlap, mode) match an exported
        whole-volume program run through it — zero interior module
        boundaries, live-model steady-state throughput.  Anything else
        falls back to tracing the imported window program inside the
        generic inferer (correct for every shape; ~0.83× on v5e).
        """
        ov = float(self.meta["infer_overlap"] if overlap is None else overlap)
        vol = jnp.asarray(volume)
        mods = jnp.asarray(modalities, jnp.int32)
        prog = self._volume_program(tuple(vol.shape[1:-1]), vol.shape[0],
                                    ov, mode)
        if prog is not None:
            fn, starts, imp, count = prog
            return fn(self.params, vol, mods, starts, imp, count)
        fb_key = (tuple(vol.shape), ov, mode)
        if fb_key not in self._fallbacks_logged:
            self._fallbacks_logged.add(fb_key)
            if self._exported_baked is None:
                # loud, once per shape: a long-running server living on
                # this path silently eats the measured 17% (round 4);
                # point at the two exports that close it
                import logging
                logging.getLogger(__name__).warning(
                    "serve: volume %s overlap=%.2f mode=%s matches no "
                    "exported volume program and the bundle has no baked "
                    "window program — using the params-as-arguments window "
                    "path (~0.83x steady state on v5e).  Re-export with "
                    "--export_volume_shapes %s or --export_bake_params to "
                    "recover ~1.0x.", tuple(vol.shape), ov, mode,
                    "x".join(str(s) for s in vol.shape[1:-1]))
        key = (ov, mode)
        if key not in self._inferers:
            if self._exported_baked is not None:
                # baked window program: weights are module constants, so
                # the generic inferer's traced per-window call keeps the
                # constant-folded layouts at any volume shape
                call = lambda pv, w, m: self._exported_baked.call(w, m)
            else:
                call = lambda pv, w, m: self._exported.call(pv, w, m)
            self._inferers[key] = SlidingWindowInferer(
                call, roi_size=tuple(self.meta["roi"]),
                sw_batch_size=int(self.meta["sw_batch_size"]),
                overlap=key[0], mode=mode,
                out_channels=int(self.meta["out_channels"]))
        return self._inferers[key](vol, mods, self.params)


def load_bundle(bundle_dir: str | Path) -> ServedModel:
    """Load a serving bundle — no model code or Config required."""
    from jax import export as jexport

    d = Path(bundle_dir)
    meta = json.loads((d / _META_FILE).read_text())
    if meta.get("bundle_version", 0) > _BUNDLE_VERSION:
        raise ValueError(f"bundle version {meta['bundle_version']} is newer "
                         f"than this runtime supports ({_BUNDLE_VERSION})")
    exported = jexport.deserialize((d / _FN_FILE).read_bytes())
    exported_baked = None
    if meta.get("window_baked") and (d / _FN_BAKED_FILE).exists():
        exported_baked = jexport.deserialize((d / _FN_BAKED_FILE).read_bytes())
    params = load_checkpoint(d / _PARAMS_FILE)["params"]
    params = jax.tree.map(jnp.asarray, params)
    return ServedModel(exported, params, meta, bundle_dir=d,
                       exported_baked=exported_baked)
