"""Convergence gates for the conditional flagships (marked slow).

The accuracy-parity proxy (VERDICT round-1 #4): each conditional model —
C-UNETR and C-Swin-UNETR here, C-UNet in test_e2e_slow — must LEARN under
the README recipe semantics (dice_focal + warmup_cosine + interleaved CT/MR
+ instance_cond norms, reference README.md:170-204) on the fixed-seed
synthetic MM-WHS stand-in.  `scripts/convergence_bench.py` runs the same
harness at a bigger budget and records trajectories to CONVERGENCE.json.
"""

import importlib.util
import sys
from argparse import Namespace
from pathlib import Path

import pytest

from miseg_tpu.data.synthetic import make_synthetic_dataset

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "convergence_bench", REPO / "scripts" / "convergence_bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("conv")
    make_synthetic_dataset(root, shape=(40, 40, 40), num_classes=3,
                           n_train=3, n_val=1, n_test=1, seed=0)
    return root


def _args(**kw):
    base = dict(epochs=10, eval_every=2, volumes=3, val_volumes=1,
                shape=40, roi=32, classes=3, seed=0)
    base.update(kw)
    return Namespace(**base)


@pytest.mark.parametrize("model", ["unetr", "swin_unetr"])
def test_conditional_flagship_learns(bench, synth_root, model):
    r = bench.run_model(model, synth_root, _args())
    hist = r["history"]
    assert len(hist) >= 3
    first, last = hist[0], hist[-1]
    # dice improves materially over the budget, and loss drops
    assert last["dice_avg"] > first["dice_avg"] + 0.05, (first, last)
    assert last["loss"] < first["loss"], (first, last)
    # both modalities produce finite per-modality dice (cond-norm path live)
    assert last["dice_ct"] == last["dice_ct"]  # not NaN
    assert last["dice_mr"] == last["dice_mr"]
