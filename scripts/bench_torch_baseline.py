#!/usr/bin/env python
"""Same-host CPU baseline: the reference's torch C-Swin-UNETR forward vs
ours, on identical hardware (this container's CPU).

The reference repo publishes no numbers and no GPU exists here, so this is
the only *measurable* reference-side denominator (VERDICT round-2,
Missing #1): time the reference's own net (run via the monai stub) on a
96³ window, and our jax model on the same CPU, single-threaded both.

Writes experiments/torch_cpu_baseline.json:
  * `torch_cpu_*`: reference torch 1.13-style net, eval, f32, no_grad
  * `jax_cpu_*`:   our flax model, jitted, f32
  * both: seconds per 96³ window (flagship fs=48) and per 64³ window
    (small fs=12) — like-for-like framework comparison on one host, plus
    the denominator bench.py uses for an honestly-labeled `vs_baseline`.

Run it ALONE (timings on the 1-core host are ruined by concurrent work):
    PYTHONPATH=/root/repo python scripts/bench_torch_baseline.py
"""

from __future__ import annotations

import json
import os
import time

RESULT = os.path.join(os.path.dirname(__file__), "..", "experiments",
                      "torch_cpu_baseline.json")


def bench_torch(fs: int, heads: tuple, roi: int, iters: int) -> float:
    import torch

    from miseg_tpu.compat import install_monai_stub
    install_monai_stub()
    from networks.norms.utils import parse_normalization
    from networks.nets.swin_unetr import SwinUNETR
    torch.set_num_threads(os.cpu_count() or 1)
    cond = parse_normalization("instance_cond", True, None, 2)
    m = SwinUNETR(img_size=(roi,) * 3, in_channels=1, out_channels=6,
                  feature_size=fs, num_heads=heads,
                  encoder_norm_name=cond, vit_norm_name=cond,
                  decoder_norm_name=parse_normalization("instance", True,
                                                        None, 2))
    m.eval()
    x = torch.randn(1, 1, roi, roi, roi)
    mods = torch.zeros(1, dtype=torch.long)
    with torch.no_grad():
        m(x, mods)  # allocator warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            m(x, mods)
        dt = (time.perf_counter() - t0) / iters
    del m
    return dt


def bench_jax(fs: int, heads: int, roi: int, iters: int) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from miseg_tpu.config import Config
    from miseg_tpu.models import model_from_config
    cfg = Config(model_name="swin_unetr", out_channels=6, feature_size=[fs],
                 num_heads=heads, roi_x=roi, roi_y=roi, roi_z=roi,
                 encoder_norm_name="instance_cond",
                 vit_norm_name="instance_cond", decoder_norm_name="instance")
    model = model_from_config(cfg)
    x = jnp.asarray(np.random.default_rng(0).random(
        (1, roi, roi, roi, 1), np.float32))
    mods = jnp.zeros((1,), jnp.int32)
    variables = model.init({"params": jax.random.key(0)}, x, mods)
    fwd = jax.jit(lambda v, a, m: model.apply(v, a, m))
    np.asarray(fwd(variables, x, mods).ravel()[0])  # compile + run
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fwd(variables, x, mods)
    np.asarray(out.ravel()[0])  # CPU backend: block is reliable, fetch anyway
    return (time.perf_counter() - t0) / iters


def main() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from miseg_tpu.utils.platform import force_cpu_devices
    force_cpu_devices(1)

    out = {"host_cpus": os.cpu_count(),
           "note": "reference torch nets run via miseg_tpu.compat monai "
                   "stub; both frameworks f32, same host, CPU-only"}

    print("small config (fs=12, 64³) ...", flush=True)
    out["jax_cpu_small_s_per_window"] = round(bench_jax(12, 2, 64, 3), 3)
    print("  jax:", out["jax_cpu_small_s_per_window"], flush=True)
    out["torch_cpu_small_s_per_window"] = round(bench_torch(
        12, (2, 4, 8, 16), 64, 3), 3)
    print("  torch:", out["torch_cpu_small_s_per_window"], flush=True)

    print("flagship config (fs=48, 96³) ...", flush=True)
    out["jax_cpu_flagship_s_per_window"] = round(bench_jax(48, 3, 96, 2), 3)
    print("  jax:", out["jax_cpu_flagship_s_per_window"], flush=True)
    out["torch_cpu_flagship_s_per_window"] = round(bench_torch(
        48, (3, 6, 12, 24), 96, 2), 3)
    print("  torch:", out["torch_cpu_flagship_s_per_window"], flush=True)

    out["torch_cpu_flagship_patches_per_sec"] = round(
        1.0 / out["torch_cpu_flagship_s_per_window"], 4)
    out["jax_vs_torch_cpu_flagship"] = round(
        out["torch_cpu_flagship_s_per_window"]
        / out["jax_cpu_flagship_s_per_window"], 3)
    os.makedirs(os.path.dirname(RESULT), exist_ok=True)
    with open(RESULT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
