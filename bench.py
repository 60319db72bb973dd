#!/usr/bin/env python
"""Benchmark: 96³-patch sliding-window inference throughput (patches/sec/chip).

The north-star metric from BASELINE.json: C-Swin-UNETR (feature_size=48,
instance_cond encoder+vit norms) sliding-window inference over a
224³ volume with 96³ ROI and 0.5 overlap — counts predictor window
evaluations per second on one chip.  Also records the flagship training
step time so both north-star axes are tracked per round.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The reference publishes no numbers (SURVEY §6) and no reference-side GPU
measurement exists in this environment, so there is NO true baseline
denominator: `vs_baseline` is null unless `BENCH_BASELINE.json` (a
previously recorded run of THIS bench) exists, in which case
`baseline_kind` says "self-previous" — i.e. the ratio means "vs our own
prior round", never "vs the PyTorch reference".
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from miseg_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    from miseg_tpu.config import Config
    from miseg_tpu.inferers import SlidingWindowInferer, dense_patch_starts, scan_interval
    from miseg_tpu.losses import loss_from_config
    from miseg_tpu.models import model_from_config

    on_tpu = any("tpu" in (getattr(d, "platform", "") or "").lower()
                 or "tpu" in str(d).lower() for d in jax.devices())
    # CPU fallback uses a small config so CI stays fast; TPU runs the real one
    if on_tpu:
        # sw_batch_size is perf-neutral since the serial-map fix (round 2:
        # bs=1/2/4 all ~25.9 patches/s; true batching loses 2.2x to an XLA
        # norm-stats fusion failure at batch>=2 — see BASELINE.md)
        fs, heads, roi, vol, sw_bs, out_ch = 48, 3, (96, 96, 96), (224, 224, 224), 1, 6
    else:
        fs, heads, roi, vol, sw_bs, out_ch = 12, 2, (32, 32, 32), (64, 64, 64), 2, 6

    cfg = Config(model_name="swin_unetr", out_channels=out_ch,
                 feature_size=[fs], num_heads=heads,
                 roi_x=roi[0], roi_y=roi[1], roi_z=roi[2],
                 encoder_norm_name="instance_cond", vit_norm_name="instance_cond",
                 decoder_norm_name="instance")
    model = model_from_config(cfg)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((1, *roi, 1), np.float32))
    mods = jnp.zeros((1,), jnp.int32)
    variables = model.init({"params": jax.random.key(0)}, x0, mods)
    # bf16 params for the TPU compute path
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables["params"])

    def predict(w, m):
        return model.apply({"params": params}, w.astype(jnp.bfloat16), m).astype(jnp.float32)

    inferer = SlidingWindowInferer(predict, roi_size=roi, sw_batch_size=sw_bs,
                                   overlap=cfg.infer_overlap, mode="gaussian",
                                   out_channels=out_ch)
    volume = jnp.asarray(rng.random((1, *vol, 1), np.float32))
    modality = jnp.zeros((1,), jnp.int32)

    n_windows = len(dense_patch_starts(vol, roi, scan_interval(roi, cfg.infer_overlap)))

    # On the tunneled backend jax.block_until_ready returns BEFORE device
    # execution finishes (verified: 10 multi-TFLOP programs "block" in <1ms,
    # then a host fetch takes seconds).  The only trustworthy sync is
    # fetching data that depends on the enqueued work, so every measurement
    # here ends with a host fetch of a jitted scalar reduction.
    fetch = jax.jit(lambda o: o.ravel()[0])

    def run_volumes(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = inferer(volume, modality)
        np.asarray(fetch(out))  # pipeline drain (programs run in order)
        return time.perf_counter() - t0

    # warmup (compile)
    t_c = time.perf_counter()
    run_volumes(1)
    print(f"# compile+warmup: {time.perf_counter() - t_c:.1f}s "
          f"({n_windows} windows)", file=sys.stderr)
    # two batch sizes; the slope cancels constant dispatch/fetch round trips
    reps = 8 if on_tpu else 1
    if on_tpu:
        t1, t2 = run_volumes(2), run_volumes(2 + reps)
        dt = (t2 - t1) / reps
    else:
        dt = run_volumes(reps) / reps
    patches_per_sec = n_windows / dt

    # ---- flagship training step (second north-star axis) -----------------
    loss_fn = loss_from_config(Config(criterion="dice_focal", out_channels=out_ch))
    params_f32 = variables["params"]
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params_f32)

    @jax.jit
    def train_step(p, o, image, label, modality):
        def loss_of(pp):
            pc = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                              if a.dtype == jnp.float32 else a, pp)
            logits = model.apply({"params": pc}, image.astype(jnp.bfloat16),
                                 modality, train=True).astype(jnp.float32)
            return loss_fn(logits, label)
        loss, grads = jax.value_and_grad(loss_of)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    label = jnp.asarray(rng.integers(0, out_ch, (1, *roi)), jnp.int32)

    def run_steps(n):
        nonlocal params_f32, opt_state
        t0 = time.perf_counter()
        loss = None
        for _ in range(n):
            params_f32, opt_state, loss = train_step(params_f32, opt_state,
                                                     x0, label, mods)
        np.asarray(loss)  # true sync (see note above)
        return time.perf_counter() - t0

    run_steps(1)  # compile
    steps = 8 if on_tpu else 2
    if on_tpu:
        t1, t2 = run_steps(2), run_steps(2 + steps)
        train_ms = (t2 - t1) / steps * 1e3
    else:
        train_ms = run_steps(steps) / steps * 1e3

    metric = ("sliding_window_96cubed_patches_per_sec_per_chip"
              if on_tpu else "sliding_window_small_patches_per_sec_cpu")
    # Preferred denominator: the MEASURED reference-side number — the
    # reference's own torch C-Swin-UNETR timed on this host's CPU
    # (scripts/bench_torch_baseline.py).  It is a cross-device ratio
    # (our TPU chip vs the reference on the only hardware it can run on
    # here) and is labeled as such; no GPU exists in this environment and
    # the reference repo publishes no numbers (SURVEY §6).
    baseline, baseline_kind = None, "none"
    torch_base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "experiments", "torch_cpu_baseline.json")
    if on_tpu and os.path.exists(torch_base):
        try:
            with open(torch_base) as f:
                baseline = json.load(f)["torch_cpu_flagship_patches_per_sec"]
            baseline_kind = "reference-torch-cpu-same-host"
        except Exception:
            baseline = None
    if baseline is None and os.path.exists("BENCH_BASELINE.json"):
        try:
            with open("BENCH_BASELINE.json") as f:
                prev = json.load(f)
            # a CPU run must not divide by a TPU-recorded value
            if prev.get("metric", metric) == metric:
                baseline = prev.get("value")
                baseline_kind = "self-previous"
        except Exception:
            baseline = None
    print(json.dumps({
        "metric": metric,
        "value": round(patches_per_sec, 3),
        "unit": "patches/s",
        "vs_baseline": round(patches_per_sec / baseline, 3) if baseline else None,
        "baseline_kind": baseline_kind,
        "train_step_ms": round(train_ms, 1),
    }))


if __name__ == "__main__":
    main()
