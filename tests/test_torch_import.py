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
