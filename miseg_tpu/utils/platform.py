"""Platform selection helpers.

This image's site hook registers the remote-TPU ("axon") PJRT plugin at
interpreter start and sets `jax.config.jax_platforms = "axon,cpu"`, which
takes precedence over the JAX_PLATFORMS env var.  Tests and the
multi-chip dry run need an N-device virtual CPU topology, so they must
(a) set --xla_force_host_platform_device_count BEFORE the first backend
init and (b) override the config value back to "cpu".
"""

from __future__ import annotations

import os


def force_cpu_devices(n: int = 8) -> None:
    """Force a virtual n-device CPU platform (call before first jax use)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def enable_compile_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache (remote-compile TPU paths are slow;
    the cache makes second runs of bench/train start in seconds)."""
    import jax
    cache_dir = path or os.environ.get("MISEG_COMPILE_CACHE",
                                       os.path.expanduser("~/.cache/miseg_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def honor_env_platform() -> None:
    """Re-assert JAX_PLATFORMS from the env over any site-hook override."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want or want == "axon":
        return
    import jax
    try:
        jax.config.update("jax_platforms", want)
    except Exception:
        pass
