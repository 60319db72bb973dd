#!/usr/bin/env python
"""Generate the MM-WHS decathlon-style split JSONs.

Reproduces the reference's CV protocol (dataset/MM-WHS/*.json — SURVEY
§2.5): 20 CT + 20 MR training volumes; CT 2-fold 10/10 splits (fold1/
fold2, each validating on the other's training ids), 16/4 single splits
(CT.json / MR.json), the all-MR training list (MR_fold.json), and an
unlabeled CT test list (CT_test.json).  File layout matches the MM-WHS
distribution: `ct_train/ct_train_10XX_image.nii.gz` +
`..._label_corrected.nii.gz`; MR images carry the `_corrected` suffix.

Usage: python scripts/make_mmwhs_splits.py --out dataset/MM-WHS
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

# the paper's CV ids (2-fold split of ct_train_1001..1020)
CT_FOLD1_TRAIN = [1001, 1007, 1008, 1009, 1011, 1012, 1015, 1016, 1017, 1019]
CT_FOLD2_TRAIN = [1002, 1003, 1004, 1005, 1006, 1010, 1013, 1014, 1018, 1020]
CT_SINGLE_VAL = [1002, 1003, 1013, 1018]
MR_SINGLE_VAL = [1002, 1009, 1017, 1018]
CT_TEST_IDS = [1002, 1003]


def _item(modality: str, idx: int, labeled: bool = True) -> dict:
    sub = f"{modality}_train"
    img_sfx = "_image_corrected" if modality == "mr" else "_image"
    out = {"image": f"{sub}/{sub}_{idx}{img_sfx}.nii.gz"}
    if labeled:
        out["label"] = f"{sub}/{sub}_{idx}_label_corrected.nii.gz"
    return out


def _doc(modality_int: int, training, validation, test, labeled_test=True) -> dict:
    mod = "ct" if modality_int == 0 else "mr"
    return {
        "description": "", "labels": {"0": "background"}, "licence": "",
        "modality": modality_int, "name": "MM-WHS", "reference": "",
        "release": "", "tensorImageSize": "3D",
        "numTraining": len(training), "numValidation": len(validation),
        "numTest": len(test),
        "training": [_item(mod, i) for i in training],
        "validation": [_item(mod, i) for i in validation],
        "test": [_item(mod, i, labeled_test) for i in test],
    }


def main(out_dir: str) -> None:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    all_ct = sorted(CT_FOLD1_TRAIN + CT_FOLD2_TRAIN)
    all_mr = list(range(1001, 1021))
    docs = {
        "CT_fold1.json": _doc(0, CT_FOLD1_TRAIN, CT_FOLD2_TRAIN, CT_FOLD2_TRAIN),
        "CT_fold2.json": _doc(0, CT_FOLD2_TRAIN, CT_FOLD1_TRAIN, CT_FOLD1_TRAIN),
        "CT.json": _doc(0, [i for i in all_ct if i not in CT_SINGLE_VAL],
                        CT_SINGLE_VAL, CT_SINGLE_VAL),
        "MR.json": _doc(1, [i for i in all_mr if i not in MR_SINGLE_VAL],
                        MR_SINGLE_VAL, MR_SINGLE_VAL),
        "MR_fold.json": _doc(1, all_mr, [], []),
        "CT_test.json": _doc(0, [], [], CT_TEST_IDS, labeled_test=False),
    }
    for name, doc in docs.items():
        with open(out / name, "w") as f:
            json.dump(doc, f, indent=2)
        print(f"wrote {out / name}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="dataset/MM-WHS")
    main(p.parse_args().out)
