"""Batch-size autoscaling: the `trainer.tune` half PTL provides.

Reference parity: `trainer.tune(lit_model, datamodule=lit_data)`
(train.py:57-60) runs PTL's Tuner, which both finds an lr
(cli/find_best_lr.py covers that half) and scales the batch size by
doubling until the step OOMs, then backing off ("power" mode).  Here
the probe compiles + executes ONE real jitted train step per candidate
batch size on synthetic ROI-shaped data and catches the XLA
resource-exhausted error family; anything else re-raises (a shape bug
must not masquerade as an OOM back-off).
"""

from __future__ import annotations

import tempfile
from typing import Callable

import numpy as np

_OOM_MARKERS = ("RESOURCE_EXHAUSTED", "Resource exhausted", "out of memory",
                "Out of memory", "OOM", "Allocation failure",
                "exceeds the memory")


def is_oom_error(e: BaseException) -> bool:
    msg = f"{type(e).__name__}: {e}"
    return any(m in msg for m in _OOM_MARKERS)


def _try_batch(cfg, batch_size: int) -> None:
    """Compile + run one train step at `batch_size`; raises on failure.

    A fresh Trainer per candidate: the jitted step is shape-specialized,
    and donated buffers from a failed attempt must not leak into the
    next one.
    """
    import jax

    from .engine import Trainer

    trainer = Trainer(cfg.replace(batch_size=batch_size),
                      workdir=tempfile.mkdtemp())
    roi = cfg.roi
    rng = np.random.default_rng(0)
    image = rng.random((batch_size, *roi, cfg.in_channels)).astype(np.float32)
    label = np.zeros((batch_size, *roi), np.int32)
    modality = (np.arange(batch_size) % max(1, cfg.num_styles)).astype(np.int32)
    state = trainer.init_state(image[:1], modality[:1])
    state, loss = trainer.train_step(
        state, {"image": image, "label": label, "modality": modality})
    # force device execution: runtime OOMs surface on the fetch, and
    # block_until_ready does not wait on the tunneled TPU backend
    float(jax.device_get(loss))


def scale_batch_size(cfg, *, max_trials: int = 8, init_val: int | None = None,
                     step_fn: Callable[[object, int], None] | None = None,
                     verbose: bool = True) -> int:
    """Largest power-of-two batch size whose train step fits in memory.

    Doubles from `init_val` (default: cfg.batch_size) until a step fails
    with an OOM/compile-resource error, then returns the last size that
    worked — PTL `Tuner.scale_batch_size(mode="power")` semantics.
    `step_fn(cfg, batch_size)` is injectable for tests.
    """
    run = step_fn or _try_batch
    bs = int(init_val or cfg.batch_size or 1)
    best: int | None = None
    for _ in range(max_trials):
        try:
            run(cfg, bs)
        except Exception as e:  # noqa: BLE001 — filtered below
            if not is_oom_error(e):
                raise
            if verbose:
                print(f"batch_size={bs} OOM — backing off")
            break
        best = bs
        if verbose:
            print(f"batch_size={bs} fits")
        bs *= 2
    if best is None:
        raise RuntimeError(
            f"batch_size={init_val or cfg.batch_size} does not fit in "
            "memory; reduce the ROI or the model size")
    return best
