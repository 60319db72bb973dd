"""Gradient-parity gate as a regression tripwire (slow).

One train step's gradients at identical weights: the reference's engine
(with `fix_reference_norm_grads` — its raw InstanceNorm backward is
broken for strided cotangents, see tests/test_ref_grad_fix.py) vs our
Trainer's `value_and_grad`, every leaf compared after mapping the torch
grads through the same per-tensor transposes as the weights.

Round-5 measurement (BASELINE.md): with the reference's backward fixed,
summed max-abs deviation across all 203 swin leaves is 6.3e-5 (torch's
own f32-vs-f64 noise is 1.6e-5); the pre-fix, apparently-divergent value
was 5.3e-3.  The gate bounds the sum at 1e-3 — an order above the
measured noise, an order below the bug signature — so any systematic
backward regression on either side trips it.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


@pytest.mark.slow
def test_swin_one_step_gradient_parity():
    import jax

    import grad_parity
    import parity_train
    from miseg_tpu.train.ref_import import reference_to_flax

    args = parity_train.argparse.Namespace(
        model="swin_unetr", shape=64, classes=4, feature_size=12,
        volumes=1, val_volumes=1, epochs=1, lr=1e-3, seed=0,
        fix_ref_grads=True, torch_f64=False)
    epochs, _ = parity_train.make_data(args)
    b0 = epochs[0][0]
    torch_state, _, ref_loss, tgrads, _ = grad_parity.torch_grads(args, b0)
    jloss, jgrads, _ = grad_parity.jax_grads(args, b0, torch_state)
    assert abs(jloss - ref_loss) < 1e-5

    mapped = reference_to_flax("swin_unetr", tgrads)

    def flat(tree):
        out = {}
        for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]:
            out["/".join(str(getattr(q, "key", "?")) for q in path)] = \
                np.asarray(v)
        return out

    ref_flat, ours_flat = flat(mapped), flat(jgrads)
    assert set(ref_flat) == set(ours_flat)
    total = 0.0
    worst = ("", 0.0)
    for key, ours in ours_flat.items():
        err = float(np.max(np.abs(ref_flat[key] - ours)))
        total += err
        if err > worst[1]:
            worst = (key, err)
    assert total < 1e-3, (total, worst)
