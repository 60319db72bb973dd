#!/usr/bin/env python
"""Certify the opt-in Pallas kernel paths against the XLA path ON REAL TPU
hardware (interpret-mode parity in tests/ covers semantics; this covers the
Mosaic compilation): full C-Swin-UNETR forward under each MISEG_PALLAS_*
flag, compared to the XLA output.

2026-08-17 (v5e): conv/attn/norm all max|diff| 0.047 on logits of scale
6.25 (rel 7.5e-3) — bf16 accumulation noise, no kernel-specific error.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_parity.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from miseg_tpu.config import Config
    from miseg_tpu.models import model_from_config
    from miseg_tpu.ops import dispatch
    from miseg_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    cfg = Config(model_name="swin_unetr", out_channels=6, feature_size=[48],
                 num_heads=3, roi_x=96, roi_y=96, roi_z=96,
                 encoder_norm_name="instance_cond",
                 vit_norm_name="instance_cond",
                 decoder_norm_name="instance")
    model = model_from_config(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 96, 96, 96, 1), np.float32))
    mods = jnp.zeros((1,), jnp.int32)
    off = {"MISEG_PALLAS_NORM": "0", "MISEG_PALLAS_ATTN": "0",
           "MISEG_PALLAS_CONV": "0"}
    os.environ.update(off)
    dispatch.clear_cache()
    variables = model.init({"params": jax.random.key(0)}, x, mods)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 else a,
                          variables["params"])

    outs = {}
    for name, flags in [("xla", {}),
                        ("conv", {"MISEG_PALLAS_CONV": "1"}),
                        ("attn", {"MISEG_PALLAS_ATTN": "1"}),
                        ("norm", {"MISEG_PALLAS_NORM": "1"})]:
        os.environ.update({**off, **flags})
        dispatch.clear_cache()
        fn = jax.jit(lambda p, w, m: model.apply(
            {"params": p}, w.astype(jnp.bfloat16), m).astype(jnp.float32))
        outs[name] = np.asarray(fn(params, x, mods))
        print(f"# {name} done", file=sys.stderr, flush=True)

    ref = outs["xla"]
    scale = float(np.abs(ref).max())
    ok = True
    for name in ("conv", "attn", "norm"):
        d = float(np.abs(outs[name] - ref).max())
        rel = d / scale
        status = "OK" if rel < 0.05 else "FAIL"
        ok &= rel < 0.05
        print(f"{name}: max|diff| vs xla = {d:.4f} "
              f"(scale {scale:.2f}, rel {rel:.5f}) {status}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
