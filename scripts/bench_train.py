#!/usr/bin/env python
"""Flagship train-step time across loss-layout variants.

bench.py's exact train protocol (C-Swin-UNETR fs=48, 96^3 patch, batch 1,
dice_focal, adamw, bf16 compute / f32 masters, fetch-synced two-batch
slopes), isolated from the 64-window inference warmup so loss-graph
experiments iterate in minutes.  Variants toggle MISEG_CM_LOSS — the
channel-major [B, C, V] loss working layout (losses.py::_layout): C pads
6->8 on sublanes instead of 6->128 on lanes, so every loss pass moves
~16x fewer physical bytes at the price of one boundary relayout each way
(round-4 layout experiment; the round-3 train accounting priced the
padded [B,V,C] loss passes at ~7+ ms/step).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train.py \
      [--fs 48] [--roi 96] [--steps 8] [--variants xla,cm_loss]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_BASE = {"MISEG_CM_LOSS": "0", "MISEG_SCATTER_BIAS_GRAD": "",
         "MISEG_BF16_SCORES": "0"}
VARIANTS = {
    "xla": dict(_BASE),
    "cm_loss": {**_BASE, "MISEG_CM_LOSS": "1"},
    # round-4 rel-pos-bias backward A/B: the default separable
    # (scatter-free) VJP vs the plain take's serial scatter-add
    # (ops/rel_bias.py; gap_accounting --train priced the scatters at
    # ~2 ms/table)
    "bias_scatter": {**_BASE, "MISEG_SCATTER_BIAS_GRAD": "1"},
    # round-5 precision experiment: bf16 materialized attention scores —
    # in training the score tensors exist in fwd AND bwd (the backward
    # re-reads them for the softmax VJP), so the traffic cut doubles
    "bf16_scores": {**_BASE, "MISEG_BF16_SCORES": "1"},
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--fs", type=int, default=48)
    p.add_argument("--roi", type=int, default=96)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--criterion", default="dice_focal")
    p.add_argument("--variants", default="xla,cm_loss")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from miseg_tpu.config import Config
    from miseg_tpu.losses import loss_from_config
    from miseg_tpu.models import model_from_config
    from miseg_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    roi = args.roi
    cfg = Config(model_name="swin_unetr", out_channels=6,
                 feature_size=[args.fs], num_heads=3,
                 roi_x=roi, roi_y=roi, roi_z=roi,
                 encoder_norm_name="instance_cond",
                 vit_norm_name="instance_cond",
                 decoder_norm_name="instance")
    model = model_from_config(cfg)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((1, roi, roi, roi, 1), np.float32))
    mods = jnp.zeros((1,), jnp.int32)
    label = jnp.asarray(rng.integers(0, 6, (1, roi, roi, roi)), jnp.int32)

    # timing only needs SHAPES: synthesize f32 master params in one jitted
    # program instead of the real init (minutes on the tunneled backend)
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)},
                           x0.astype(jnp.float32), mods))

    @jax.jit
    def make_params(key):
        leaves, treedef = jax.tree.flatten(shapes["params"])
        keys = jax.random.split(key, len(leaves))
        return jax.tree.unflatten(treedef, [
            0.05 * jax.random.normal(k, a.shape, a.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating)
            else jnp.zeros(a.shape, a.dtype)
            for k, a in zip(keys, leaves)])

    params0 = make_params(jax.random.key(0))
    tx = optax.adamw(1e-4)

    n = args.steps
    print(f"{'variant':10s} {'ms/step':>9s} {'compile s':>10s} {'loss@1':>12s}")
    for name in args.variants.split(","):
        os.environ.update(VARIANTS[name])
        from miseg_tpu.ops import dispatch
        dispatch.clear_cache()
        loss_fn = loss_from_config(Config(criterion=args.criterion,
                                          out_channels=6))
        params = params0
        opt_state = tx.init(params)

        @jax.jit
        def train_step(p, o, image, lab, m):
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

        def run_steps(k):
            nonlocal params, opt_state
            t0 = time.perf_counter()
            loss = None
            for _ in range(k):
                params, opt_state, loss = train_step(params, opt_state,
                                                     x0, label, mods)
            l = float(np.asarray(loss))  # true sync via host fetch
            return time.perf_counter() - t0, l

        t0 = time.perf_counter()
        _, l1 = run_steps(1)  # compile; loss@1 certifies variant parity
        tc = time.perf_counter() - t0
        (t1, _), (t2, _) = run_steps(2), run_steps(2 + n)
        ms = (t2 - t1) / n * 1e3
        print(f"{name:10s} {ms:9.1f} {tc:10.1f} {l1:12.6f}", flush=True)


if __name__ == "__main__":
    main()
