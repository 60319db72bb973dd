"""Synthetic MM-WHS-like dataset generator (for tests/bench/CI).

Writes small NIfTI volumes with sphere-ish multi-class labels and
decathlon-style split JSONs matching the reference's layout
(dataset/MM-WHS/*.json: top-level `modality` int + training/validation/
test lists — SURVEY §2.5).  No real MM-WHS data ships with either repo;
this generator provides a drop-in stand-in with the same on-disk shape.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from .nifti import save_nifti


def _volume(rng: np.random.Generator, shape, num_classes: int, modality: int,
            mr_style: str = "legacy"):
    """Image with class-dependent blobs; MR gets a different intensity law.

    Gap styles for the conditional-norm capability ablation:
      * `"inverted"` — MR gets inverted contrast (bright background,
        darker blobs) and 3× noise.  Measured round 3: NOT sufficient —
        shared convs absorb a polarity flip (cond 0.346 vs plain 0.350
        dice @16ep), see BASELINE.md.
      * `"classswap"` — MR uses the SAME intensity law as CT but with the
        class→intensity ranking reversed: one appearance means different
        classes in different modalities, so an unconditioned shared net
        faces an ambiguous mapping it cannot resolve, while per-modality
        norm banks (conditional_instance_norm.py:27-60) — or separate
        models — can.  This is the regime the paper's conditioning
        targets (fat/water-style contrast reversals).

        Round-3 v1 of this style kept the legacy 0.1-per-class intensity
        step (2σ of the noise): even separate per-modality models only
        reached per-class dice 0.2–0.33, so every arm was undertrained
        and the ambiguity delta was invisible (ABLATION.json classswap-v1
        NULL).  v2 widens the step to 0.2 (4σ) so the task is easy
        EXCEPT for the cross-modality ambiguity, and uses an identical
        raw affine for both modalities so nothing but the label
        semantics distinguishes them.  v2 ALSO nulled — its rank
        reversal has a fixed point (middle class unswapped) and blobs
        overlap additively, blurring intensity→class within a modality.
      * `"derangement"` (v3) — every foreground class's intensity rank
        is cyclically shifted in MR (c → c%n_fg + 1: no fixed points),
        blobs are rejection-sampled to be disjoint so intensity↔class
        is a bijection within each modality, and the raw affine is
        identical across modalities.  A modality-blind net faces an
        irreducible relabeling ambiguity on EVERY foreground voxel;
        per-modality norm banks (conditional_instance_norm.py:27-60) or
        separate models resolve it."""
    zz, yy, xx = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape],
                             indexing="ij")
    label = np.zeros(shape, np.int16)
    inverted = modality == 1 and mr_style == "inverted"
    swapped = modality == 1 and mr_style in ("classswap", "derangement")
    sigma = 0.15 if inverted else 0.05
    img = rng.normal(0.9 if inverted else 0.0, sigma, shape).astype(np.float32)
    placed: list[tuple[np.ndarray, float]] = []  # (center, radius) of placed blobs
    for c in range(1, num_classes):
        center = rng.uniform(-0.5, 0.5, 3)
        radius = rng.uniform(0.15, 0.35)
        if mr_style == "derangement":
            # Disjoint blobs: intensity↔class must be a bijection within a
            # modality, so the ONLY ambiguity is the cross-modality relabel.
            for _ in range(100):
                if all(np.linalg.norm(center - pc) > radius + pr + 0.05
                       for pc, pr in placed):
                    break
                center = rng.uniform(-0.6, 0.6, 3)
                radius = rng.uniform(0.12, 0.22)
            placed.append((center, radius))
        blob = ((zz - center[0]) ** 2 + (yy - center[1]) ** 2
                + (xx - center[2]) ** 2) < radius ** 2
        label[blob] = c
        if inverted:
            img[blob] -= 0.25 + 0.12 * c  # darker than background, reversed
        elif mr_style == "classswap":
            rank = (num_classes - c) if swapped else c  # reversed class rank
            img[blob] += 0.2 + 0.2 * rank  # 4σ steps: separable per modality
        elif mr_style == "derangement":
            n_fg = num_classes - 1
            rank = (c % n_fg) + 1 if swapped else c  # cyclic: no fixed point
            img[blob] = rng.normal(0.2 + 0.2 * rank, sigma, img[blob].shape)
        else:
            img[blob] += 0.3 + 0.1 * c if modality == 0 else 1.0 - 0.1 * c
    if mr_style in ("classswap", "derangement"):
        img = img * 400 - 100  # identical affine: only label semantics differ
    else:
        img = img * 400 + (-100 if modality == 0 else 50)  # HU-ish vs MR-ish
    return img.astype(np.float32), label


def make_synthetic_dataset(root: str | Path, *, n_train: int = 2, n_val: int = 1,
                           n_test: int = 1, shape=(48, 48, 48),
                           num_classes: int = 4, modalities=(0, 1),
                           spacing=(1.5, 1.5, 1.5), seed: int = 0,
                           mr_style: str = "legacy") -> list[str]:
    """Create volumes + per-modality JSONs; returns the JSON paths."""
    root = Path(root)
    jsons = []
    rng = np.random.default_rng(seed)
    for modality in modalities:
        name = "CT" if modality == 0 else "MR"
        sub = root / f"{name.lower()}_train"
        sub.mkdir(parents=True, exist_ok=True)
        affine = np.diag([*spacing, 1.0])
        affine[:3, :3] *= np.array([[-1], [-1], [1]])  # LPS-ish, exercises RAS reorient
        splits = {"training": n_train, "validation": n_val, "test": n_test}
        lists: dict[str, list] = {k: [] for k in splits}
        idx = 1000
        for split, n in splits.items():
            for _ in range(n):
                idx += 1
                img, lab = _volume(rng, shape, num_classes, modality,
                                   mr_style=mr_style)
                ipath = sub / f"{name.lower()}_train_{idx}_image.nii.gz"
                lpath = sub / f"{name.lower()}_train_{idx}_label.nii.gz"
                save_nifti(ipath, img, affine)
                save_nifti(lpath, lab, affine)
                lists[split].append({"image": str(ipath.relative_to(root)),
                                     "label": str(lpath.relative_to(root))})
        doc = {"name": "synthetic", "modality": modality,
               "labels": {str(i): f"class{i}" for i in range(num_classes)},
               "tensorImageSize": "3D", **lists}
        jpath = root / f"{name}.json"
        with open(jpath, "w") as f:
            json.dump(doc, f)
        jsons.append(str(jpath))
    return jsons
