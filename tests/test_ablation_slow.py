"""Conditional-norm capability ablation: evidence gate + machinery.

The capability numbers themselves are measured on the TPU
(`scripts/ablation_cond_norm.py`, recorded in ABLATION.json — cond
+0.233 over plain at 8 vols/modality; cond beats BOTH plain (+0.168)
and separate models (+0.126) at 2 vols/modality).  A live CPU-budget
training gate was piloted and NULLS (40 ep / 4 vols: cond 0.4166 vs
plain 0.4154, identical per-class profiles) — the delta needs ~10× the
steps a CI-sized CPU run can afford, so re-training here would gate on
noise.  What this file gates instead:

  * the committed evidence file keeps the positive deltas (a regression
    — e.g. re-running the script with a broken generator — would
    overwrite them and fail here);
  * the derangement generator's invariants (the *reason* the v3 design
    produces a real ambiguity where v1/v2 nulled);
  * the 3-arm script machinery end-to-end at a tiny budget (slow).
"""

import json
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _derangement_records():
    recs = json.loads((REPO / "ABLATION.json").read_text())
    return [r for r in recs if r.get("gap") == "derangement"]


def test_recorded_capability_deltas_stay_positive():
    recs = _derangement_records()
    assert recs, "no derangement records in ABLATION.json"
    ample = [r for r in recs if r["volumes_per_modality"] >= 8]
    scarce = [r for r in recs if r["volumes_per_modality"] <= 2]
    assert ample and ample[-1]["delta_cond_vs_plain"] >= 0.1, \
        "cond-vs-plain advantage lost at ample data"
    assert scarce and scarce[-1]["delta_cond_vs_plain"] >= 0.1
    assert scarce[-1]["delta_cond_vs_separate"] >= 0.05, \
        "the scarcity crossover (cond > separate nets) is the paper's claim"


def test_derangement_generator_invariants():
    from miseg_tpu.data.synthetic import _volume
    for seed in range(4):
        r0, r1 = np.random.default_rng(seed), np.random.default_rng(seed)
        ict, lct = _volume(r0, (48, 48, 48), 4, 0, mr_style="derangement")
        imr, lmr = _volume(r1, (48, 48, 48), 4, 1, mr_style="derangement")
        # same rng stream => identical geometry; only intensities swap
        np.testing.assert_array_equal(lct, lmr)
        # every fg class survives (disjoint blobs: no overwriting)
        for c in range(1, 4):
            assert (lct == c).sum() > 0
        means_ct = np.array([ict[lct == c].mean() for c in range(1, 4)])
        means_mr = np.array([imr[lmr == c].mean() for c in range(1, 4)])
        # CT ranks {1,2,3} -> MR ranks {2,3,1}: a cyclic derangement —
        # every class's intensity changes (no fixed point)
        np.testing.assert_allclose(means_mr, np.roll(means_ct, -1), atol=15)
        assert (np.abs(means_mr - means_ct) > 40).all()
        # identical raw affine: background statistics indistinguishable
        assert abs(ict[lct == 0].mean() - imr[lmr == 0].mean()) < 5


@pytest.mark.slow
def test_ablation_script_machinery(tmp_path):
    """All three arms run end-to-end at a 1-epoch budget and produce the
    record schema BASELINE.md summarizes."""
    import argparse
    import sys
    sys.path.insert(0, str(REPO / "scripts"))
    from ablation_cond_norm import run
    from miseg_tpu.data.synthetic import make_synthetic_dataset

    args = argparse.Namespace(epochs=1, volumes=1, val_volumes=1, shape=32,
                              roi=16, classes=4, seed=0, gap="derangement")
    make_synthetic_dataset(tmp_path, shape=(32,) * 3, num_classes=4,
                           n_train=1, n_val=1, n_test=1, seed=0,
                           mr_style="derangement")
    rec = run(tmp_path, args)
    for key in ("instance_cond", "instance", "per_modality",
                "delta_cond_vs_plain", "delta_cond_vs_separate"):
        assert key in rec
    for arm in ("instance_cond", "instance"):
        assert np.isfinite(rec[arm]["dice_avg"])
        assert rec[arm]["dice_ct"] is not None
    assert np.isfinite(rec["per_modality"]["dice_avg"])
