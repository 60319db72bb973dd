#!/usr/bin/env python
"""Why is the served bundle 0.83x the live model? Diff their compiled HLO.

bench_serve.py measured the AOT StableHLO bundle at 21.5 patches/s vs the
live jitted model's 25.9 on identical sliding-window protocol.  This tool
compiles BOTH volume-level programs for the real backend and compares
physical (tile-padded) HBM traffic per instruction, printing the ops that
exist (or grew) on the bundle side — the fusion/hoisting the imported
module boundary costs.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/serve_traffic.py \
      [--fs 48] [--roi 96] [--vol 224] [--platforms tpu,cpu]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gap_accounting import hlo_bytes_by_name  # noqa: E402


def traffic(compiled) -> dict[str, tuple[int, str]]:
    return hlo_bytes_by_name(compiled.as_text())


def by_kind(m: dict[str, tuple[int, str]]) -> Counter:
    c: Counter = Counter()
    for nbytes, kind in m.values():
        c[kind] += nbytes
    return c


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--fs", type=int, default=48)
    p.add_argument("--roi", type=int, default=96)
    p.add_argument("--vol", type=int, default=224)
    p.add_argument("--platforms", default="tpu,cpu")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from miseg_tpu.config import Config
    from miseg_tpu.inferers import SlidingWindowInferer
    from miseg_tpu.models import model_from_config
    from miseg_tpu.serve import export_bundle, load_bundle
    from miseg_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    roi = (args.roi,) * 3
    cfg = Config(model_name="swin_unetr", out_channels=6,
                 feature_size=[args.fs], num_heads=3,
                 roi_x=args.roi, roi_y=args.roi, roi_z=args.roi,
                 encoder_norm_name="instance_cond",
                 vit_norm_name="instance_cond",
                 decoder_norm_name="instance")
    model = model_from_config(cfg)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((1, *roi, 1), np.float32))
    mods = jnp.zeros((1,), jnp.int32)
    params = model.init({"params": jax.random.key(0)}, x0, mods)["params"]

    bundle_dir = export_bundle(
        cfg, params, tempfile.mkdtemp() + "/bundle",
        platforms=tuple(args.platforms.split(",")))
    served = load_bundle(bundle_dir)

    bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    def live_predict(w, m):
        return model.apply({"params": bf16}, w.astype(jnp.bfloat16),
                           m).astype(jnp.float32)

    live = SlidingWindowInferer(live_predict, roi_size=roi, sw_batch_size=1,
                                overlap=cfg.infer_overlap, mode="gaussian",
                                out_channels=6)
    vol = jax.ShapeDtypeStruct((1,) + (args.vol,) * 3 + (1,), jnp.float32)
    m1 = jax.ShapeDtypeStruct((1,), jnp.int32)

    live_c = jax.jit(lambda v, m: live(v, m)).lower(vol, m1).compile()
    inf = SlidingWindowInferer(
        lambda pv, w, m: served._exported.call(pv, w, m),
        roi_size=roi, sw_batch_size=1, overlap=cfg.infer_overlap,
        mode="gaussian", out_channels=6)
    srv_c = jax.jit(lambda v, m, pv: inf(v, m, pv)).lower(
        vol, m1, served.params).compile()

    t_live, t_srv = traffic(live_c), traffic(srv_c)
    gb_live = sum(b for b, _ in t_live.values()) / 1e9
    gb_srv = sum(b for b, _ in t_srv.values()) / 1e9
    print(f"# live  physical traffic {gb_live:.2f} GB "
          f"({len(t_live)} ops)")
    print(f"# bundle physical traffic {gb_srv:.2f} GB "
          f"({len(t_srv)} ops)")
    kl, ks = by_kind(t_live), by_kind(t_srv)
    print(f"{'kind':16s} {'live GB':>9s} {'bundle GB':>9s} {'delta':>9s}")
    for kind in sorted(set(kl) | set(ks),
                       key=lambda k: ks.get(k, 0) - kl.get(k, 0)):
        a, b = kl.get(kind, 0) / 1e9, ks.get(kind, 0) / 1e9
        if max(a, b) < 0.01:
            continue
        print(f"{kind:16s} {a:9.2f} {b:9.2f} {b - a:+9.2f}")
    # biggest bundle-side ops with no same-size live counterpart
    live_sizes = Counter(b for b, _ in t_live.values())
    extra = []
    for name, (b, kind) in t_srv.items():
        if live_sizes.get(b, 0) > 0:
            live_sizes[b] -= 1
        else:
            extra.append((b, kind, name))
    extra.sort(reverse=True)
    print("\n# top bundle-only ops (no same-size live counterpart):")
    for b, kind, name in extra[:15]:
        print(f"  {b/1e6:10.1f} MB  {kind:10s} {name}")


if __name__ == "__main__":
    main()
