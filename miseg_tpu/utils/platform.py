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


def _machine_fingerprint() -> str:
    """Short hash of this host's CPU feature set + arch.

    XLA:CPU AOT-compiles to the host's exact CPU features; reusing a
    persistent cache entry on a machine with a different feature set logs
    feature-mismatch warnings and risks SIGILL.  Scoping the cache dir by
    this fingerprint keeps each machine type's entries separate (the TPU
    bench host keeps its warm cache; a different driver host cold-compiles
    instead of replaying foreign AOT code)."""
    import hashlib
    import platform as _plat
    feats = model = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not feats and line.startswith(("flags", "Features")):
                    feats = line.strip()
                if not model and line.startswith("model name"):
                    # XLA:CPU derives tuning pseudo-features
                    # (+prefer-no-gather/-scatter) from the CPU MODEL, not
                    # the flags line — identical flags on a different model
                    # still replayed mismatched AOT entries (observed
                    # 2026-08-18 in CLI runs).
                    model = line.strip()
                if feats and model:
                    break
    except OSError:
        pass
    # Salt with the jaxlib version: AOT code also depends on the compiler
    # (identical cpuinfo flags still replayed foreign prefer-no-* entries
    # from an older container — observed 2026-08-17).
    try:
        import jaxlib
        ver = jaxlib.__version__
    except Exception:
        ver = "?"
    key = f"v3|{_plat.machine()}|{ver}|{model}|{feats}"
    return hashlib.sha1(key.encode()).hexdigest()[:10]


def enable_compile_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache (remote-compile TPU paths are slow;
    the cache makes second runs of bench/train start in seconds).

    Set MISEG_NO_COMPILE_CACHE=1 to skip entirely (used by the multi-chip
    dry run, where CPU compiles are fast and cache reuse across machine
    types is the only risk)."""
    import jax
    if os.environ.get("MISEG_NO_COMPILE_CACHE"):
        return
    base = path or os.environ.get("MISEG_COMPILE_CACHE",
                                  os.path.expanduser("~/.cache/miseg_jax"))
    cache_dir = os.path.join(base, _machine_fingerprint())
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
