"""Optimizer factory: Adam / AdamW / SGD(+nesterov) with weight decay,
freeze-encoder masking, and gradient accumulation.

Reference parity:
  * `optimizer_from_argparse_args` (utils/training_utils.py:39-62) —
    adam/adamw/sgd(momentum=0.99, nesterov), weight_decay=`reg_weight`;
  * gradient accumulation — `optax.MultiSteps` replaces the raw loop's
    scale/no_sync bookkeeping (utils/trainer.py:33-78); grads are averaged
    over `iters_to_accumulate` micro-steps, matching loss/k scaling;
  * `freeze_encoder` — torch `requires_grad_(False)` on encoder subtrees
    (e.g. unetr.py:205-211) maps to `optax.multi_transform` with
    `set_to_zero` on params under the model's `ENCODER_PREFIXES`.

The learning rate is injected via `optax.inject_hyperparams` so host-side
(per-epoch / plateau) schedules update it without recompiling.
"""

from __future__ import annotations

from typing import Sequence

import jax
import optax


def _base_optimizer(cfg, learning_rate):
    name = cfg.optim_name
    if name == "adam":
        # torch Adam's weight_decay is L2-added-to-grad, not decoupled
        return optax.chain(optax.add_decayed_weights(cfg.reg_weight),
                           optax.scale_by_adam(),
                           optax.scale_by_learning_rate(learning_rate))
    if name == "adamw":
        return optax.adamw(learning_rate, weight_decay=cfg.reg_weight)
    if name == "sgd":
        return optax.chain(optax.add_decayed_weights(cfg.reg_weight),
                           optax.sgd(learning_rate, momentum=cfg.momentum,
                                     nesterov=True))
    raise ValueError(f"Optimization {name} not implemented, please chose another optimizer.")


def freeze_mask(params, prefixes: Sequence[str]):
    """Label each param leaf 'freeze' when it matches a prefix.

    A prefix containing '/' or '*' is an fnmatch pattern over the full
    '/'-joined path (needed for nested encoder subtrees, e.g. the
    recursive UNet's '*/down/*'); otherwise it matches the top-level
    module by prefix (e.g. 'encoder1', 'down_path').
    """
    import fnmatch

    def label(path, _):
        keys = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        full = "/".join(keys)
        for pat in prefixes:
            if "/" in pat or "*" in pat:
                if fnmatch.fnmatch(full, pat):
                    return "freeze"
            elif keys and (keys[0] == pat or keys[0].startswith(pat)):
                return "freeze"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def optimizer_from_config(cfg, params=None, encoder_prefixes: Sequence[str] = ()):
    """Build the full optax transform (lr-injected, masked, accumulated)."""

    def make(learning_rate):
        opt = _base_optimizer(cfg, learning_rate)
        if cfg.freeze_encoder and params is not None and encoder_prefixes:
            labels = freeze_mask(params, encoder_prefixes)
            opt = optax.multi_transform(
                {"train": opt, "freeze": optax.set_to_zero()}, labels)
        return opt

    tx = optax.inject_hyperparams(make)(learning_rate=cfg.lr)
    if cfg.iters_to_accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.iters_to_accumulate)
    return tx


def make_accumulation_flush(tx, k: int):
    """Jittable flush of a partial `optax.MultiSteps` window.

    Reference parity: the raw loop steps on `(idx+1) % k == 0` OR the last
    batch of the loader (utils/trainer.py:33-52), with every micro-loss
    pre-scaled by 1/k — so a tail window of m < k micro-batches applies
    sum_m(grad)/k = mean_m(grad) * m/k.  `optax.MultiSteps` alone only steps
    every k, silently carrying the tail into the next epoch (and under the
    next epoch's learning rate); calling the returned `flush(params,
    opt_state)` at epoch end reproduces the reference's step boundary.

    Only call when `opt_state.mini_step > 0` (a zero-grad inner update would
    still advance stateful optimizers like Adam).  Returns None when `tx`
    is not a MultiSteps wrapper.
    """
    import jax.numpy as jnp

    if not isinstance(tx, optax.MultiSteps):
        return None
    inner = tx.inner_opt

    def flush(params, opt_state):
        m = opt_state.mini_step  # acc_grads holds the running MEAN over m
        scale = m.astype(jnp.float32) / float(k)
        scaled = jax.tree.map(lambda g: (g * scale).astype(g.dtype),
                              opt_state.acc_grads)
        updates, new_inner = inner.update(scaled, opt_state.inner_opt_state,
                                          params)
        new_params = optax.apply_updates(params, updates)
        new_state = optax.MultiStepsState(
            mini_step=jnp.zeros_like(opt_state.mini_step),
            gradient_step=opt_state.gradient_step + 1,
            inner_opt_state=new_inner,
            acc_grads=jax.tree.map(jnp.zeros_like, opt_state.acc_grads),
            skip_state=opt_state.skip_state)
        return new_params, new_state

    return flush


def set_learning_rate(opt_state, lr: float):
    """Write a new lr into an inject_hyperparams state (MultiSteps-aware)."""
    import jax.numpy as jnp
    inner = opt_state
    if hasattr(inner, "inner_opt_state"):  # MultiSteps wrapper
        hyper = inner.inner_opt_state.hyperparams
        hyper["learning_rate"] = jnp.asarray(lr, dtype=hyper["learning_rate"].dtype)
        return opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        lr, dtype=opt_state.hyperparams["learning_rate"].dtype)
    return opt_state


def optimizer_step_count(opt_state, iters_to_accumulate: int = 1) -> int:
    """Micro-steps taken so far, recovered from a (restored) opt state.

    Used to resume `TrainState.step` — and with it the in-jit
    `fold_in(key, step)` dropout stream — after a checkpoint load, so a
    resumed run continues the rng sequence instead of replaying step 0.
    """
    if hasattr(opt_state, "gradient_step"):  # MultiSteps wrapper
        return (int(opt_state.gradient_step) * max(1, iters_to_accumulate)
                + int(opt_state.mini_step))
    if hasattr(opt_state, "count"):  # inject_hyperparams state
        return int(opt_state.count)
    return 0


def current_learning_rate(opt_state) -> float:
    inner = opt_state
    if hasattr(inner, "inner_opt_state"):
        return float(inner.inner_opt_state.hyperparams["learning_rate"])
    return float(opt_state.hyperparams["learning_rate"])
