"""Kernel dispatch: choose Pallas-fused vs plain-XLA implementations.

Policy: Pallas kernels are ON when running on TPU, OFF elsewhere (the
interpreter is correct but slow).  Override with MISEG_PALLAS=0/1.
"""

from __future__ import annotations

import functools
import os

import jax


def _flag(name: str) -> bool | None:
    env = os.environ.get(name)
    if env is None or env.strip() == "":
        return None  # unset or set-but-empty → no opinion
    return env.strip().lower() not in ("0", "false", "off")


@functools.lru_cache(maxsize=1)
def use_pallas() -> bool:
    env = _flag("MISEG_PALLAS")
    if env is not None:
        return env
    # Default OFF: measured on v5e, the current fused kernels trail XLA's
    # own fusion on the full C-Swin-UNETR forward (39ms vs 60ms/window).
    # The kernels are correct (parity-tested) and opt-in via MISEG_PALLAS=1
    # (or per-kernel MISEG_PALLAS_NORM / MISEG_PALLAS_ATTN) pending tuning.
    return False


@functools.lru_cache(maxsize=1)
def use_pallas_norm() -> bool:
    env = _flag("MISEG_PALLAS_NORM")
    return env if env is not None else use_pallas()


@functools.lru_cache(maxsize=1)
def use_pallas_attn() -> bool:
    env = _flag("MISEG_PALLAS_ATTN")
    return env if env is not None else use_pallas()


@functools.lru_cache(maxsize=1)
def pallas_attn_min_bw() -> int | None:
    """Stage-selective attention kernel: MISEG_PALLAS_ATTN_MIN_BW=K uses
    the Pallas kernel ONLY for window-attention calls whose window-batch
    (B·nW, a static shape under jit) is ≥ K — e.g. K=128 hits just the
    swin stage-1 layers (343 windows at 96³), where gap_accounting.py
    measured the score/softmax materialization (~546 MB f32) while later
    stages (≤64 windows) keep XLA's fusion.  Unset → no opinion."""
    v = os.environ.get("MISEG_PALLAS_ATTN_MIN_BW", "").strip()
    return int(v) if v else None


@functools.lru_cache(maxsize=1)
def use_bf16_scores() -> bool:
    """Materialize window-attention score tensors in bf16 instead of f32
    (DEFAULT ON since round 5; MISEG_BF16_SCORES=0 restores f32 scores).
    The QKᵀ einsum still accumulates f32 on the MXU and softmax still
    subtracts-max/exps/sums in f32 — only the HBM tensor between the two
    fusions is rounded (the stage-1 `[343,3,343,343]` scores are the
    single largest forward tensor: ~546 MB f32/window).  Engages only
    when Q/K are already bf16, so f32 runs are bit-identical by
    construction.  Measured on v5e (round 5, scripts/bench_forward.py /
    bench_train.py, same-session XLA control arms): inference 43.95 →
    35.61 ms/window (−19%), train 159.4 → 147.2 ms/step (−7.7%), step-1
    loss bit-identical at print precision.  Like every flag here the
    value is lru_cached and read at trace time: toggling the env
    mid-process requires `clear_cache()` plus a retrace."""
    env = _flag("MISEG_BF16_SCORES")
    return True if env is None else env


@functools.lru_cache(maxsize=1)
def use_pallas_conv() -> bool:
    env = _flag("MISEG_PALLAS_CONV")
    return env if env is not None else use_pallas()


def interpret_default() -> bool:
    """Pallas kernels run the interpreter off-TPU (CPU tests) and compiled
    Mosaic on real hardware — the single source of truth for the backend
    sniff every kernel entry point shares."""
    return jax.default_backend() not in ("tpu", "axon")


def clear_cache() -> None:
    use_pallas.cache_clear()
    use_pallas_norm.cache_clear()
    use_pallas_attn.cache_clear()
    pallas_attn_min_bw.cache_clear()
    use_bf16_scores.cache_clear()
    use_pallas_conv.cache_clear()
