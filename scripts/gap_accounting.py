#!/usr/bin/env python
"""Per-op accounting of the forward-time vs padded-traffic-roofline gap.

Round 2 established: 38.8 ms measured per 96³ window vs 32.1 ms roofline
of the model's own PHYSICAL (tile-padded) traffic — a 17% residual the
VERDICT asked to be either closed or explained (r2 weak #1).  This tool
explains it op by op: it merges

  * per-instruction physical HBM bytes from the optimized HLO
    (hlo_traffic.py machinery — tile-padded layouts), with
  * per-instruction DEVICE time from an xplane trace
    (profile_tpu.py machinery),

matched on instruction name, and prints achieved GB/s per op.  Ops far
below the ~819 GB/s v5e HBM roofline are the gap; their HLO opcode says
why (VPU-bound softmax/normalization chains, layout copies, gathers...).

Async ops (`copy-start`/`-done` weight prefetches) overlap compute and
are reported separately — their time does not serialize into the wall.

Round 3 extends the same accounting to the TRAINING step (`--train`):
the exact bench.py protocol (batch=1 96³, dice_focal, adamw, bf16
compute / f32 master params) — so the 165 ms train headline gets the
same per-op physical-traffic roofline treatment as the forward.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/gap_accounting.py \
      [--fs 48] [--roi 96] [--reps 6] [--top 30] [--train]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hlo_traffic import classify, parse_shape  # noqa: E402
from profile_tpu import parse_trace  # noqa: E402

HBM_GBPS = 819.0  # v5e


def hlo_bytes_by_name(hlo: str) -> dict[str, tuple[int, str]]:
    """instruction name -> (physical bytes, op kind), top-level ops only."""
    out: dict[str, tuple[int, str]] = {}
    in_fusion_body = False
    for raw in hlo.splitlines():
        line = raw.strip()
        if line.endswith("{") and not line.startswith("ENTRY"):
            name = line.split()[0].lstrip("%")
            in_fusion_body = ("fused" in name or "region" in name
                              or name.startswith(("add", "max", "min", "and",
                                                  "or", "mul")))
            continue
        if line == "}":
            in_fusion_body = False
            continue
        if in_fusion_body or (not line.startswith("%")
                              and not line.startswith("ROOT")):
            continue
        if "= parameter(" in line or "constant(" in line:
            continue
        nbytes = parse_shape(line)
        if nbytes:
            name = line.split("=")[0].strip().lstrip("%")
            out[name] = (nbytes, classify(line))
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--fs", type=int, default=48)
    p.add_argument("--roi", type=int, default=96)
    p.add_argument("--reps", type=int, default=6)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--train", action="store_true",
                   help="account the bench.py training step instead of the "
                        "inference forward")
    p.add_argument("--dump", default=None, metavar="PATH",
                   help="write the optimized HLO text to PATH and exit "
                        "before tracing (compile-cache hit makes this "
                        "cheap; use to inspect fusion bodies by name)")
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
    x = jnp.asarray(rng.random((1, args.roi, args.roi, args.roi, 1),
                               np.float32))
    mods = jnp.zeros((1,), jnp.int32)
    variables = model.init({"params": jax.random.key(0)}, x, mods)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables["params"])
    xb = x.astype(jnp.bfloat16)

    fetch = jax.jit(lambda o: o.ravel()[0])
    if args.train:
        # the bench.py train-step protocol, verbatim (bench.py:108-124)
        import optax
        from miseg_tpu.losses import loss_from_config
        loss_fn = loss_from_config(Config(criterion="dice_focal",
                                          out_channels=6))
        params_f32 = variables["params"]
        tx = optax.adamw(1e-4)
        opt_state = tx.init(params_f32)
        label = jnp.asarray(rng.integers(0, 6, (1,) + (args.roi,) * 3),
                            jnp.int32)

        @jax.jit
        def step(p, o, image, lab, m):
            def loss_of(pp):
                pc = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                                  if a.dtype == jnp.float32 else a, pp)
                logits = model.apply({"params": pc},
                                     image.astype(jnp.bfloat16), m,
                                     train=True).astype(jnp.float32)
                return loss_fn(logits, lab)
            loss, grads = jax.value_and_grad(loss_of)(p)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        compiled = step.lower(params_f32, opt_state, x, label, mods).compile()

        def run_once():
            nonlocal params_f32, opt_state
            params_f32, opt_state, loss = step(params_f32, opt_state, x,
                                               label, mods)
            return loss
    else:
        fwd = jax.jit(lambda p, w, m: model.apply({"params": p}, w, m))
        compiled = fwd.lower(params, xb, mods).compile()

        def run_once():
            return fwd(params, xb, mods)

    if args.dump:
        Path(args.dump).write_text(compiled.as_text())
        print(f"# optimized HLO written to {args.dump}", flush=True)
        return

    by_name = hlo_bytes_by_name(compiled.as_text())
    total_gb = sum(b for b, _ in by_name.values()) / 1e9
    print(f"# physical traffic {total_gb:.1f} GB; roofline "
          f"{total_gb / HBM_GBPS * 1e3:.1f} ms", flush=True)

    np.asarray(fetch(run_once()))  # compile+warm
    logdir = tempfile.mkdtemp(prefix="miseg_gap_")
    with jax.profiler.trace(logdir):
        out = None
        for _ in range(args.reps):
            out = run_once()
        np.asarray(fetch(out))
        time.sleep(1.0)

    rows = parse_trace(logdir, top=4096)
    sync_ms = async_ms = matched_gb = 0.0
    table = []
    for name, tot_ms, n in rows:
        base = name.split(" ")[0].lstrip("%").split("=")[0].strip().lstrip("%")
        ms = tot_ms / max(1, args.reps)
        if "jit_fn" in name or "jit_step" in name or "TPU" in base:
            continue
        if base.isdigit():  # whole-program invocation rows, not HLO ops
            continue
        is_async = "start" in base or "done" in base
        info = by_name.get(base)
        if is_async:
            async_ms += ms
            continue
        sync_ms += ms
        if info:
            nbytes, kind = info
            matched_gb += nbytes / 1e9
            gbps = nbytes / 1e9 / (ms / 1e3) if ms > 0 else float("inf")
            table.append((ms, base, kind, nbytes / 1e6, gbps))
        else:
            table.append((ms, base, "?", 0.0, float("nan")))

    table.sort(reverse=True)
    print(f"# synchronous device time {sync_ms:.1f} ms/call; async "
          f"(overlapped prefetch) {async_ms:.1f} ms/call", flush=True)
    print(f"{'ms':>7s} {'MB':>9s} {'GB/s':>7s} {'%roof':>6s}  op")
    for ms, base, kind, mb, gbps in table[:args.top]:
        pct = 100 * gbps / HBM_GBPS if gbps == gbps else float("nan")
        print(f"{ms:7.3f} {mb:9.1f} {gbps:7.0f} {pct:6.0f}  {kind:10s} {base}")
    slow = sum(ms for ms, _, _, mb, gbps in table
               if gbps == gbps and gbps < 0.5 * HBM_GBPS)
    print(f"\n# time in ops running <50% of HBM roofline: {slow:.1f} ms/call "
          f"(the gap lives here)")


if __name__ == "__main__":
    main()
