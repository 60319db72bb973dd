"""Reference-checkpoint import: key translation + full-coverage merge."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miseg_tpu.models import UNet
from miseg_tpu.train.pretrained import _flatten
from miseg_tpu.train.torch_import import (translate_reference_state_dict,
                                          _module_path)


def test_module_path_rules():
    cases = {
        "model.0.conv.unit0.conv": ["model", "down", "unit0", "conv"],
        "model.0.conv.unit0.adn.N": ["model", "down", "unit0", "adn", "N"],
        "model.1.submodule.0.conv.unit0.conv":
            ["model", "sub", "down", "unit0", "conv"],
        "model.1.submodule.1.submodule.conv.unit0.conv":
            ["model", "sub", "bottom", "unit0", "conv"],
        "model.1.submodule.2.0.conv": ["model", "sub", "up", "conv"],
        "model.1.submodule.2.1.conv.unit0.conv":
            ["model", "sub", "up_ru", "unit0", "conv"],
        "model.2.0.adn.N": ["model", "up", "adn", "N"],
        "swinViT.layers1.0.blocks.0.attn.qkv":
            ["swinViT", "layers1", "blocks_0", "attn", "qkv"],
        "swinViT.layers1.0.downsample.reduction":
            ["swinViT", "layers1", "downsample", "reduction"],
        "vit.blocks.3.attn.out_proj": ["vit", "blocks_3", "attn", "proj"],
        "vit.patch_embedding.patch_embeddings.1":
            ["vit", "patch_embedding", "patch_embeddings"],
        "encoder2.transp_conv_init.conv": ["encoder2", "transp_conv_init",
                                           "conv"],
        "encoder2.blocks.0.0.conv": ["encoder2", "up0", "conv"],
        "encoder2.blocks.1.1.conv1.conv": ["encoder2", "block1", "conv1",
                                           "conv"],
        "decoder5.transp_conv.conv": ["decoder5", "transp_conv", "conv"],
        "decoder5.conv_block.conv1.conv": ["decoder5", "conv_block", "conv1",
                                           "conv"],
        "down_path.0.1.conv.unit1.adn.N": ["down_path_0_1", "unit1", "adn",
                                           "N"],
        "up_path.2.1.conv.unit0.conv": ["up_path_2", "unit0", "conv"],
        "out.conv.conv": ["out", "conv", "conv"],
    }
    for dotted, want in cases.items():
        assert _module_path(dotted) == want, dotted


def _reverse_unet_key(path: tuple, leaf: np.ndarray) -> tuple[str, np.ndarray]:
    """Our flax path → reference torch key+tensor for the small test UNet."""
    seg = {"down": "0", "up": "2.0", "up_ru": "2.1"}
    parts = []
    for p in path[:-1]:
        if p == "model":
            parts.append("model")
        elif p == "sub":
            parts.append("1.submodule")
        elif p == "bottom":
            parts.append("1.submodule")
        elif p in seg:
            parts.append(seg[p])
        elif re.fullmatch(r"unit\d+", p):
            parts.append(f"conv.{p}")
        else:
            parts.append(p)
    base = ".".join(parts)
    name = path[-1]
    arr = np.asarray(leaf)
    if name == "kernel":
        transposed = any(p in ("up",) for p in path)
        if path[-2] == "conv" or path[-2] == "residual":
            # non-transposed: flax [*k, I, O] → torch [O, I, *k]
            t = np.transpose(arr, (arr.ndim - 1, arr.ndim - 2,
                                   *range(arr.ndim - 2)))
            return base + ".weight", t
        if transposed:
            # transposed conv: flax [*k, I, O] → torch [I, O, *k];
            # the reference nests the raw conv under ".conv"
            t = np.transpose(arr, (arr.ndim - 2, arr.ndim - 1,
                                   *range(arr.ndim - 2)))
            return base + ".conv.weight", t
        raise AssertionError(path)
    if name == "slope":
        return base + ".weight", arr
    if name in ("scale", "bias"):
        kind = "weight" if name == "scale" else "bias"
        if arr.ndim == 2:  # conditional bank → emitted separately
            return base + f".norms.*.{kind}", arr
        return base + f".{kind}", arr
    raise AssertionError(path)


def test_unet_full_checkpoint_roundtrip(rng):
    """Translate a COMPLETE reference-style UNet state dict and verify
    every leaf of our param tree is loaded with the right values."""
    model = UNet(in_channels=1, out_channels=2, channels=(2, 4, 8),
                 strides=(2, 2), num_res_units=1,
                 norm_down=("instance_cond", {"num_styles": 2}),
                 norm_up=("instance", {}))
    v = model.init({"params": jax.random.key(0)},
                   jnp.ones((1, 16, 16, 16, 1)), jnp.array([0], jnp.int32))
    params = jax.tree.map(np.asarray, v["params"])
    flat = _flatten(params)

    sd = {}
    for path, leaf in flat.items():
        val = rng.standard_normal(leaf.shape).astype(np.float32)
        key, t = _reverse_unet_key(path, val)
        if ".norms.*." in key:
            for s in range(val.shape[0]):
                sd[key.replace("*", str(s))] = t[s]
        else:
            sd[key] = t
        flat[path] = val  # expected value after import

    src = translate_reference_state_dict(sd)
    src_flat = _flatten(src)
    missing = [p for p in flat if p not in src_flat]
    assert not missing, missing[:5]
    for p, want in flat.items():
        got = np.asarray(src_flat[p])
        assert got.shape == want.shape, (p, got.shape, want.shape)
        assert np.allclose(got, want), p


def test_lightning_prefix_and_fc_rename(rng):
    sd = {"model.out.conv.conv.weight": rng.standard_normal((2, 4, 1, 1, 1)),
          "model.vit.blocks.0.mlp.fc1.weight": rng.standard_normal((8, 4))}
    src = translate_reference_state_dict(sd)
    assert src["out"]["conv"]["conv"]["kernel"].shape == (1, 1, 1, 4, 2)
    assert src["vit"]["blocks_0"]["mlp"]["linear1"]["kernel"].shape == (4, 8)


def test_pre_swin_unetr_ingest(tmp_path, rng):
    """Driver config #4: fine-tune from MONAI's SSL `model_swinvit.pt` —
    swinViT weights transplant (with torch->flax layout moves), everything
    else stays at init (utils.py:28-37 semantics)."""
    import jax
    import jax.numpy as jnp
    import torch

    from miseg_tpu.config import Config
    from miseg_tpu.models import model_from_config
    from miseg_tpu.train.pretrained import load_swin_vit_torch

    cfg = Config(model_name="pre_swin_unetr", out_channels=3,
                 feature_size=[12], num_heads=2, roi_x=32, roi_y=32, roi_z=32,
                 encoder_norm_name="instance", vit_norm_name="layer",
                 decoder_norm_name="instance")
    model = model_from_config(cfg)
    x = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x,
                           jnp.zeros((1,), jnp.int32))
    params = variables["params"]
    svt = params["swinViT"]

    # synthesize a torch checkpoint whose tensors invert our flax layouts,
    # with the module. prefix and fc1/fc2 names the reference strips/renames
    pe = np.asarray(svt["patch_embed"]["proj"]["kernel"])  # [*k, I, O]
    qkv = np.asarray(svt["layers1"]["blocks_0"]["attn"]["qkv"]["kernel"])
    mlp1 = np.asarray(svt["layers1"]["blocks_0"]["mlp"]["linear1"]["kernel"])
    sd = {
        "module.swinViT.patch_embed.proj.weight": torch.from_numpy(
            rng.standard_normal(tuple(np.transpose(
                pe, (4, 3, 0, 1, 2)).shape)).astype(np.float32)),
        "module.swinViT.layers1.0.blocks.0.attn.qkv.weight": torch.from_numpy(
            rng.standard_normal(qkv.T.shape).astype(np.float32)),
        "module.swinViT.layers1.0.blocks.0.mlp.fc1.weight": torch.from_numpy(
            rng.standard_normal(mlp1.T.shape).astype(np.float32)),
        # wrong-shaped entry must be shape-skipped, not crash
        "module.swinViT.layers2.0.blocks.0.attn.qkv.weight": torch.from_numpy(
            rng.standard_normal((5, 5)).astype(np.float32)),
    }
    path = tmp_path / "model_swinvit.pt"
    torch.save({"state_dict": sd}, path)

    loaded = load_swin_vit_torch(str(path), params, verbose=False)

    got = np.asarray(loaded["swinViT"]["patch_embed"]["proj"]["kernel"])
    want = np.transpose(sd["module.swinViT.patch_embed.proj.weight"].numpy(),
                        (2, 3, 4, 1, 0))
    assert np.allclose(got, want)
    got_qkv = np.asarray(loaded["swinViT"]["layers1"]["blocks_0"]["attn"]["qkv"]["kernel"])
    assert np.allclose(
        got_qkv, sd["module.swinViT.layers1.0.blocks.0.attn.qkv.weight"].numpy().T)
    got_mlp = np.asarray(loaded["swinViT"]["layers1"]["blocks_0"]["mlp"]["linear1"]["kernel"])
    assert np.allclose(
        got_mlp, sd["module.swinViT.layers1.0.blocks.0.mlp.fc1.weight"].numpy().T)
    # untouched subtree and shape-skipped entry stay at init
    assert np.allclose(np.asarray(loaded["encoder1"]["layer"]["conv1"]["conv"]["kernel"]),
                       np.asarray(params["encoder1"]["layer"]["conv1"]["conv"]["kernel"]))
    assert np.allclose(
        np.asarray(loaded["swinViT"]["layers2"]["blocks_0"]["attn"]["qkv"]["kernel"]),
        np.asarray(svt["layers2"]["blocks_0"]["attn"]["qkv"]["kernel"]))
    # the engine path consumes it end-to-end
    from miseg_tpu.train.engine import Trainer
    eng = Trainer(cfg.replace(pre_swin=str(path)))
    state = eng.fresh_state(np.zeros((1, 32, 32, 32, 1), np.float32),
                            np.zeros((1,), np.int32))
    got2 = np.asarray(state.params["swinViT"]["patch_embed"]["proj"]["kernel"])
    assert np.allclose(got2, want)
