#!/usr/bin/env python
"""Physical HBM traffic map of the compiled flagship forward.

Parses the optimized HLO (with layouts) and computes PHYSICAL bytes per
instruction — including the tile padding the layout implies (T(8,128)
pads the second-minor dim to 8 and the minor dim to 128; bf16 (2,1)
subtiles pad the second-minor to 16) — then aggregates by op kind.
`jax.cost_analysis` uses logical bytes, which hides exactly the padding
this model suffers from (48-channel minor dims).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/hlo_traffic.py [--fs 48] [--roi 96] [--top 25]
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1,
               "u8": 1, "f16": 2, "s64": 8, "u64": 8, "f64": 8, "s16": 2,
               "u16": 2}

SHAPE_RE = re.compile(
    r"(\w+)\[([\d,]*)\](?:\{([\d,]+)(?::T\(([\d,]+)\)(?:\(([\d,]+)\))?)?[^}]*\})?")


def physical_bytes(dtype: str, dims: list[int], perm: list[int] | None,
                   tile: list[int] | None, subtile: list[int] | None) -> int:
    """Bytes of one array under its layout (tile-padded)."""
    bpe = DTYPE_BYTES.get(dtype)
    if bpe is None or not dims:
        return 0
    if perm is None or tile is None:
        import math
        return bpe * max(1, math.prod(dims))
    # perm lists minor-to-major; physical order major..minor:
    phys = [dims[i] for i in perm][::-1]
    # tile applies to the trailing len(tile) physical dims
    t = list(tile)
    pad = phys[:]
    for i, ti in enumerate(reversed(t)):
        j = len(pad) - 1 - i
        if j < 0:
            break
        pad[j] = -(-pad[j] // ti) * ti
    import math
    return bpe * max(1, math.prod(pad))


def parse_shape(text: str) -> int:
    total = 0
    for m in SHAPE_RE.finditer(text):
        dtype, dims_s, perm_s, tile_s, sub_s = m.groups()
        if dtype not in DTYPE_BYTES:
            continue
        dims = [int(x) for x in dims_s.split(",") if x] if dims_s else []
        perm = [int(x) for x in perm_s.split(",")] if perm_s else None
        tile = [int(x) for x in tile_s.split(",")] if tile_s else None
        sub = [int(x) for x in sub_s.split(",")] if sub_s else None
        total += physical_bytes(dtype, dims, perm, tile, sub)
    return total


def classify(line: str) -> str:
    # async collectives keep their own family (all-gather-start etc.);
    # only copy-start/copy-done count as copies.  Matches are on the
    # ` kind(` call form so e.g. reduce-scatter never lands in "reduce".
    for kind in ("all-gather", "all-reduce", "reduce-scatter",
                 "collective-permute", "convolution", "fusion",
                 "dynamic-update-slice", "dynamic-slice", "copy",
                 "transpose", "reduce-window", "reduce", "custom-call",
                 "dot", "pad", "slice", "bitcast", "while", "broadcast",
                 "iota", "constant", "parameter", "reshape"):
        if (f" {kind}(" in line or f" {kind}-start(" in line
                or f" {kind}-done(" in line):
            return kind
    return "other"


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--fs", type=int, default=48)
    p.add_argument("--roi", type=int, default=96)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from miseg_tpu.config import Config
    from miseg_tpu.models import model_from_config
    from miseg_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    cfg = Config(model_name="swin_unetr", out_channels=6,
                 feature_size=[args.fs], num_heads=3,
                 roi_x=args.roi, roi_y=args.roi, roi_z=args.roi,
                 encoder_norm_name="instance_cond",
                 vit_norm_name="instance_cond",
                 decoder_norm_name="instance")
    model = model_from_config(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((args.batch, args.roi, args.roi, args.roi, 1),
                               np.float32), jnp.bfloat16)
    mods = jnp.zeros((args.batch,), jnp.int32)
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)},
                           x.astype(jnp.float32), mods))
    params = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(
            a.shape, jnp.bfloat16 if a.dtype == jnp.float32 else a.dtype),
        variables["params"])

    def fwd(p, w, m):
        return model.apply({"params": p}, w, m)

    compiled = jax.jit(fwd).lower(params, x, mods).compile()
    hlo = compiled.as_text()

    rows = []
    in_fusion_body = False
    for raw in hlo.splitlines():
        line = raw.strip()
        # fusion bodies never touch HBM — count only top-level computations
        if line.endswith("{") and not line.startswith("ENTRY"):
            name = line.split()[0].lstrip("%")
            in_fusion_body = ("fused" in name or "region" in name
                              or name.startswith(("add", "max", "min", "and",
                                                  "or", "mul")))
            continue
        if line == "}":
            in_fusion_body = False
            continue
        if in_fusion_body:
            continue
        if not line.startswith("%") and not line.startswith("ROOT"):
            continue
        if "= parameter(" in line or "constant(" in line:
            continue
        nbytes = parse_shape(line)
        if nbytes:
            name = line.split("=")[0].strip().lstrip("%")
            rows.append((nbytes, classify(line), name, line[:100]))
    rows.sort(reverse=True)
    by_kind = defaultdict(int)
    for nbytes, kind, _, _ in rows:
        by_kind[kind] += nbytes
    total = sum(by_kind.values())
    print(f"total physical bytes touched (operands+outputs, padded): "
          f"{total / 1e9:.1f} GB")
    print(f"roofline at 819 GB/s: {total / 819e9 * 1e3:.1f} ms\n")
    print(f"{'kind':22s} {'GB':>8s} {'%':>6s}")
    for kind, b in sorted(by_kind.items(), key=lambda kv: -kv[1]):
        print(f"{kind:22s} {b / 1e9:8.2f} {100 * b / total:6.1f}")
    print(f"\ntop {args.top} instructions:")
    for nbytes, kind, name, snip in rows[:args.top]:
        print(f"{nbytes / 1e6:9.1f} MB  {kind:12s} {snip}")


if __name__ == "__main__":
    main()
