"""`predict_whs.py` — NIfTI prediction export in native space.

Reference parity (predict_whs.py:18-137): deterministic transform chain
with allow_missing_keys → sliding-window predict → argmax → INVERSE
transforms back to native voxel space (pad crop, resample, reorient) →
remap class ids to MM-WHS label values {1:500, 2:600, 3:420, 4:550,
5:205, 6:820, 7:850} → save NIfTI with the original affine.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..config import Config, parse_config
from ..data.datalist import load_decathlon_datalist_with_modality
from ..data.multi_modal import eval_transforms
from ..data.nifti import save_nifti
from ..train.checkpoint import load_any_checkpoint_params
from ..train.engine import Trainer

# MM-WHS ground-truth label values (predict_whs.py:18-32)
MMWHS_LABEL_MAP = {1: 500, 2: 600, 3: 420, 4: 550, 5: 205, 6: 820, 7: 850}


def remap_labels(pred: np.ndarray, mapping: dict[int, int] = MMWHS_LABEL_MAP) -> np.ndarray:
    out = np.zeros_like(pred, dtype=np.uint16)
    for src, dst in mapping.items():
        out[pred == src] = dst
    return out


def main(cfg: Config | None = None, *, result_dir: str | None = None,
         data_dir: str | None = None, json_list: str | None = None) -> list[str]:
    cfg = cfg or parse_config()
    result_dir = result_dir or os.path.join(cfg.default_root_dir, "predictions")
    data_dir = data_dir or cfg.data_dirs[0]
    json_list = json_list or cfg.json_lists[0]

    trainer = Trainer(cfg, workdir=cfg.default_root_dir)
    sample = np.zeros((1, *cfg.roi, cfg.in_channels), np.float32)
    state = trainer.init_state(sample, np.zeros((1,), np.int32))
    if cfg.ckpt_path or cfg.pretrained:
        params = load_any_checkpoint_params(cfg.ckpt_path or cfg.pretrained,
                                            state.params)
        state = state.replace(params=params)
    inferer = trainer.make_inferer()

    tr = eval_transforms(cfg, allow_missing_keys=True)
    datalist = load_decathlon_datalist_with_modality(
        os.path.join(data_dir, json_list), True, "test", base_dir=data_dir)
    Path(result_dir).mkdir(parents=True, exist_ok=True)

    written = []
    for el in datalist:
        # "label"=image records the transform ops used to invert the pred
        # (predict_whs.py:89-92)
        sample_d = tr({"image": el["image"], "label": el["image"]})
        image = jnp.asarray(sample_d["image"])[None]
        modality = jnp.asarray([el["modality"]], jnp.int32)
        logits = inferer(image, modality, (state.params, state.extra_vars))
        pred = np.asarray(jnp.argmax(logits[0], axis=-1), np.int32)

        inv_d = dict(sample_d)
        inv_d["label"] = pred[..., None].astype(np.float32)
        inverted = tr.inverse(inv_d, key="label")
        final = remap_labels(np.rint(np.asarray(inverted["label"])).astype(np.int32))

        original_affine = sample_d["image_meta"]["original_affine"]
        img_name = os.path.basename(sample_d["image_meta"]["filename_or_obj"])
        out_path = os.path.join(result_dir, img_name.replace("image", "label"))
        save_nifti(out_path, final.astype(np.uint16), original_affine)
        written.append(out_path)
        print(f"wrote {out_path}")
    return written


if __name__ == "__main__":
    main()
