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
    use_pallas_conv.cache_clear()
