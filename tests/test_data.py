"""Data pipeline: NIfTI IO, transform invertibility, sampling, loaders."""

import json

import numpy as np
import pytest

from miseg_tpu.config import Config
from miseg_tpu.data import transforms as T
from miseg_tpu.data.datalist import load_decathlon_datalist_with_modality
from miseg_tpu.data.dataset import (CacheDataset, ConcatDataset, DataLoader,
                                    Dataset, default_collate)
from miseg_tpu.data.multi_modal import MultiModalData, eval_transforms, train_transforms
from miseg_tpu.data.nifti import load_nifti, save_nifti
from miseg_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    make_synthetic_dataset(root, shape=(40, 44, 36), num_classes=3)
    return root


def test_nifti_roundtrip(tmp_path, rng):
    aff = np.array([[0, -1.5, 0, 10], [2.0, 0, 0, -5],
                    [0, 0, 2.5, 3], [0, 0, 0, 1.0]])
    data = (rng.random((12, 10, 8)) * 100).astype(np.float32)
    save_nifti(tmp_path / "x.nii.gz", data, aff)
    img = load_nifti(tmp_path / "x.nii.gz")
    assert np.allclose(img.data, data, atol=1e-4)
    assert np.allclose(img.affine, aff, atol=1e-4)
    # uncompressed too
    save_nifti(tmp_path / "x.nii", data.astype(np.int16), aff)
    img2 = load_nifti(tmp_path / "x.nii")
    assert img2.data.dtype == np.int16


def test_orientation_to_ras(tmp_path, rng):
    # LPS affine: flips first two axes
    aff = np.diag([-1.0, -1.0, 1.0, 1.0])
    data = rng.random((6, 8, 10)).astype(np.float32)
    save_nifti(tmp_path / "a.nii", data, aff)
    tr = T.Compose([T.LoadImaged(["image"]), T.EnsureChannelLastd(["image"]),
                    T.Orientationd(["image"])])
    out = tr({"image": str(tmp_path / "a.nii")})
    new_aff = out["image_meta"]["affine"]
    assert np.all(np.diag(new_aff)[:3] > 0)  # now RAS
    assert np.allclose(out["image"][..., 0], data[::-1, ::-1, :])


def test_full_chain_invertibility(synth):
    cfg = Config(roi_x=48, roi_y=48, roi_z=48, space_x=1.0, space_y=1.0,
                 space_z=1.0)
    tr = eval_transforms(cfg)
    items = load_decathlon_datalist_with_modality(synth / "CT.json", True,
                                                  "training", base_dir=synth)
    d = tr({"image": items[0]["image"], "label": items[0]["label"]})
    inv = tr.inverse(d, key="label")
    orig = load_nifti(items[0]["label"]).data
    assert inv["label"].shape == orig.shape
    agree = (np.rint(inv["label"]) == orig).mean()
    assert agree > 0.98


def test_pos_neg_crop_balance(synth, rng):
    cfg = Config(roi_x=24, roi_y=24, roi_z=24, patches_training_sample=8)
    tr = train_transforms(cfg)
    items = load_decathlon_datalist_with_modality(synth / "CT.json", True,
                                                  "training", base_dir=synth)
    out = tr({"image": items[0]["image"], "label": items[0]["label"],
              "_rng": np.random.default_rng(0)})
    assert len(out) == 8
    for it in out:
        assert it["image"].shape == (24, 24, 24, 1)
    # roughly half the crops should be foreground-centered
    fg = sum(it["label"][12, 12, 12, 0] > 0 for it in out)
    assert 1 <= fg <= 7


def test_datalist_modality_injection(synth):
    ct = load_decathlon_datalist_with_modality(synth / "CT.json", True,
                                               "training", base_dir=synth)
    mr = load_decathlon_datalist_with_modality(synth / "MR.json", True,
                                               "training", base_dir=synth)
    assert all(i["modality"] == 0 for i in ct)
    assert all(i["modality"] == 1 for i in mr)


def test_loader_interleaves_and_collates(synth):
    cfg = Config(data_dirs=[str(synth)] * 2, json_lists=["CT.json", "MR.json"],
                 roi_x=24, roi_y=24, roi_z=24, batch_size=2,
                 patches_training_sample=1, cache_num=0,
                 use_normal_dataset=True, num_workers=0)
    dm = MultiModalData(cfg)
    loader = dm.train_dataloader()
    batch = next(iter(loader))
    assert batch["image"].shape == (2, 24, 24, 24, 1)
    assert batch["label"].shape == (2, 24, 24, 24, 1)
    assert batch["modality"].shape == (2,)
    mods = set()
    for b in loader:
        mods.update(b["modality"].tolist())
    assert mods == {0, 1}


def test_loader_sharding(synth):
    cfg = Config(data_dirs=[str(synth)], json_lists=["CT.json"],
                 roi_x=24, roi_y=24, roi_z=24, batch_size=1,
                 patches_training_sample=1, use_normal_dataset=True,
                 num_workers=0)
    dm0 = MultiModalData(cfg, shard=0, num_shards=2)
    dm1 = MultiModalData(cfg, shard=1, num_shards=2)
    l0, l1 = dm0.train_dataloader(), dm1.train_dataloader()
    assert len(l0) == len(l1)


def test_cache_dataset_deterministic_prefix(synth):
    cfg = Config(roi_x=24, roi_y=24, roi_z=24, patches_training_sample=1)
    items = load_decathlon_datalist_with_modality(synth / "CT.json", True,
                                                  "training", base_dir=synth)
    ds = CacheDataset(items, train_transforms(cfg), cache_num=2, num_workers=1)
    a = ds.get(0, np.random.default_rng(5))
    b = ds.get(0, np.random.default_rng(5))
    a = a[0] if isinstance(a, list) else a
    b = b[0] if isinstance(b, list) else b
    assert np.allclose(a["image"], b["image"])  # same rng → same crop


def test_loader_epoch_reseed(synth):
    cfg = Config(roi_x=24, roi_y=24, roi_z=24, patches_training_sample=1,
                 use_normal_dataset=True, num_workers=0,
                 data_dirs=[str(synth)], json_lists=["CT.json"])
    dm = MultiModalData(cfg)
    loader = dm.train_dataloader()
    loader.set_epoch(0)
    a = [b["modality"] for b in loader]
    loader.set_epoch(1)
    loader2 = dm.train_dataloader()
    loader2.set_epoch(0)
    c = [b["modality"] for b in loader2]
    assert all((x == y).all() for x, y in zip(a, c))  # same epoch → same order


def test_orientation_oblique_affine(tmp_path, rng):
    """Slightly oblique affines (direction cosines off-axis) must still
    resolve a consistent RAS permutation and invert cleanly."""
    from scipy.spatial.transform import Rotation
    R = Rotation.from_euler("xyz", [8, -5, 3], degrees=True).as_matrix()
    aff = np.eye(4)
    aff[:3, :3] = R @ np.diag([-1.2, 1.0, 1.5])  # oblique + one flip
    data = rng.random((10, 12, 14)).astype(np.float32)
    save_nifti(tmp_path / "o.nii", data, aff)
    tr = T.Compose([T.LoadImaged(["image"]), T.EnsureChannelLastd(["image"]),
                    T.Orientationd(["image"])])
    out = tr({"image": str(tmp_path / "o.nii")})
    new_aff = out["image_meta"]["affine"]
    assert np.all(np.diag(new_aff)[:3] > 0)  # dominant directions RAS
    inv = tr.inverse(out, key="image")
    assert np.allclose(inv["image"], data, atol=1e-5)


def test_public_api_lazy_imports():
    import miseg_tpu
    assert miseg_tpu.Config is not None
    assert miseg_tpu.Trainer is not None
    assert miseg_tpu.SlidingWindowInferer is not None


def test_fgbg_precomputed_indices_match_inline(synth):
    """FgBgToIndicesd cached pools must yield the exact same crops as the
    inline argwhere path (same rng stream -> same centers)."""
    items = load_decathlon_datalist_with_modality(synth / "CT.json", True,
                                                  "training", base_dir=synth)
    base = T.Compose([
        T.LoadImaged(["image", "label"]),
        T.EnsureChannelLastd(["image", "label"]),
        T.ScaleIntensityd(["image"]),
    ])
    d0 = base({"image": items[0]["image"], "label": items[0]["label"]})
    crop = T.RandCropByPosNegLabeld(["image", "label"], label_key="label",
                                    spatial_size=(16, 16, 16), pos=1, neg=1,
                                    num_samples=6, image_key="image",
                                    image_threshold=0)
    out_inline = crop({**d0, "_rng": np.random.default_rng(7)})
    d1 = T.FgBgToIndicesd(["label"], image_key="image", image_threshold=0)(d0)
    assert "label_fg_indices" in d1 and "label_bg_indices" in d1
    out_cached = crop({**d1, "_rng": np.random.default_rng(7)})
    for a, b in zip(out_inline, out_cached):
        assert np.array_equal(a["image"], b["image"])
        assert np.array_equal(a["label"], b["label"])
        # stale full-volume pools must not leak into the crops
        assert "label_fg_indices" not in b


def test_train_chain_caches_fgbg_in_prefix(synth):
    """The fg/bg precompute is deterministic, so CacheDataset puts it in the
    cached prefix — no per-epoch argwhere."""
    cfg = Config(roi_x=24, roi_y=24, roi_z=24, patches_training_sample=2)
    tr = train_transforms(cfg)
    items = load_decathlon_datalist_with_modality(synth / "CT.json", True,
                                                  "training", base_dir=synth)
    ds = CacheDataset(items[:1], tr, cache_num=1, num_workers=1)
    cached = ds._cache[0]
    assert "label_fg_indices" in cached
    out = ds.get(0, np.random.default_rng(3))
    assert len(out) == 2 and out[0]["image"].shape == (24, 24, 24, 1)
