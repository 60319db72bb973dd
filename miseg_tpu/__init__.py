"""miseg_tpu — TPU-native cross-modality medical image segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of MI-Seg
(matteo-bastico/MI-Seg): conditional (per-modality) normalization, 3D
UNet/UNETR/Swin-UNETR families, a MONAI-style invertible preprocessing
pipeline, on-device sliding-window inference, and a single sharded training
engine (data/tensor/spatial parallel over a `jax.sharding.Mesh`).

Layout conventions (TPU-first, deliberately different from the reference):
  * tensors are channel-LAST: volumes are [B, D, H, W, C] — XLA's native
    TPU conv layout, so convolutions tile straight onto the MXU;
  * `modalities: i32[B]` is an ordinary traced argument threaded through
    every model; conditional norms GATHER per-style (gamma, beta) and run a
    single vectorized normalization (the reference loops over the batch in
    Python — conditional_instance_norm.py:59-60);
  * everything under `jit` has static shapes; dynamic volume sizes live
    only in the CPU data pipeline and the sliding-window tiler.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy public API (keeps bare `import miseg_tpu` jax-import-free)."""
    if name == "Config":
        from .config import Config
        return Config
    if name == "Trainer":
        from .train.engine import Trainer
        return Trainer
    if name == "model_from_config":
        from .models import model_from_config
        return model_from_config
    if name == "SlidingWindowInferer":
        from .inferers import SlidingWindowInferer
        return SlidingWindowInferer
    if name == "MultiModalData":
        from .data.multi_modal import MultiModalData
        return MultiModalData
    raise AttributeError(f"module 'miseg_tpu' has no attribute {name!r}")
