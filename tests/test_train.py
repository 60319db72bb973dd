"""Training engine units: schedules, optimizer masking, checkpoints, a
full tiny fit, and pretrained-weight merging."""

import numpy as np
import pytest

from miseg_tpu.config import Config
from miseg_tpu.train.schedules import (PlateauScheduler, cosine_annealing,
                                       scheduler_from_config, warmup_cosine)


def test_warmup_cosine_shape():
    lr = 1e-3
    vals = [warmup_cosine(e, lr=lr, warmup_epochs=5, t_total=20) for e in range(20)]
    assert vals[0] == 0.0
    assert vals[4] == pytest.approx(lr * 4 / 5)
    assert vals[5] == pytest.approx(lr)
    assert vals[-1] < lr * 0.05


def test_cosine_annealing():
    assert cosine_annealing(0, lr=1.0, t_max=10) == pytest.approx(1.0)
    assert cosine_annealing(10, lr=1.0, t_max=10) == pytest.approx(0.0)


def test_plateau_scheduler():
    s = PlateauScheduler(1.0, patience=1, factor=0.1)
    assert s.step(1.0) == 1.0
    assert s.step(1.0) == 1.0   # bad 1
    assert s.step(1.0) == 0.1   # bad 2 > patience → drop
    assert s.step(0.5) == 0.1   # improvement resets


def test_scheduler_from_config_dispatch():
    for name in ("warmup_cosine", "cosine", "reduce_on_plateau", "none"):
        fn = scheduler_from_config(Config(scheduler=name, max_epochs=10))
        assert np.isfinite(fn(1, 0.5))
    with pytest.raises(ValueError):
        scheduler_from_config(Config(scheduler="bogus"))


def test_freeze_mask():
    import jax.numpy as jnp

    from miseg_tpu.train.optim import freeze_mask
    params = {"vit": {"w": jnp.ones(2)}, "out": {"w": jnp.ones(2)}}
    labels = freeze_mask(params, ("vit",))
    assert labels["vit"]["w"] == "freeze"
    assert labels["out"]["w"] == "train"


def test_optimizer_lr_injection():
    import jax.numpy as jnp

    from miseg_tpu.train.optim import (current_learning_rate,
                                       optimizer_from_config,
                                       set_learning_rate)
    cfg = Config(optim_name="adamw", lr=1e-3)
    params = {"w": jnp.ones(3)}
    tx = optimizer_from_config(cfg, params)
    st = tx.init(params)
    assert current_learning_rate(st) == pytest.approx(1e-3)
    st = set_learning_rate(st, 5e-4)
    assert current_learning_rate(st) == pytest.approx(5e-4)
    g = {"w": jnp.ones(3)}
    up, st2 = tx.update(g, st, params)
    assert np.isfinite(np.asarray(up["w"])).all()


def test_optimizer_accumulation():
    import jax.numpy as jnp
    import optax

    from miseg_tpu.train.optim import optimizer_from_config
    cfg = Config(optim_name="sgd", lr=1.0, reg_weight=0.0, momentum=0.0,
                 iters_to_accumulate=2)
    params = {"w": jnp.zeros(1)}
    tx = optimizer_from_config(cfg, params)
    st = tx.init(params)
    up1, st = tx.update({"w": jnp.ones(1)}, st, params)
    assert np.allclose(np.asarray(up1["w"]), 0.0)  # mini-step: no update yet
    up2, st = tx.update({"w": jnp.ones(1) * 3}, st, params)
    # averaged grad (1+3)/2=2 → sgd lr 1 (nesterov, momentum 0) → -2
    assert np.asarray(up2["w"])[0] == pytest.approx(-2.0)


def test_accumulation_tail_flush_matches_reference_loop():
    """n_batches % k != 0: micro-loop + epoch-end flush must equal the
    reference's raw loop, which steps on (idx+1)%k==0 OR the last batch
    with every micro-loss scaled by 1/k (utils/trainer.py:33-52)."""
    import jax.numpy as jnp

    from miseg_tpu.train.optim import (make_accumulation_flush,
                                       optimizer_from_config)
    k, n = 3, 7
    rng = np.random.default_rng(3)
    grads = [{"w": jnp.asarray(rng.normal(size=4), jnp.float32)}
             for _ in range(n)]
    params0 = {"w": jnp.asarray(rng.normal(size=4), jnp.float32)}

    # ours: MultiSteps micro-steps + tail flush
    cfg = Config(optim_name="adam", lr=1e-2, reg_weight=0.0,
                 iters_to_accumulate=k)
    tx = optimizer_from_config(cfg, params0)
    st = tx.init(params0)
    params = params0
    for g in grads:
        up, st = tx.update(g, st, params)
        params = optax_apply(params, up)
    assert int(st.mini_step) == n % k
    flush = make_accumulation_flush(tx, k)
    params, st = flush(params, st)
    assert int(st.mini_step) == 0
    assert int(st.gradient_step) == -(-n // k)  # ceil(n/k) applied steps

    # reference loop: accumulate sum(grad/k), step at k-boundary or last
    cfg1 = Config(optim_name="adam", lr=1e-2, reg_weight=0.0,
                  iters_to_accumulate=1)
    inner = optimizer_from_config(cfg1, params0)
    ist = inner.init(params0)
    ref = params0
    acc = {"w": jnp.zeros(4)}
    for i, g in enumerate(grads):
        acc = {"w": acc["w"] + g["w"] / k}
        if (i + 1) % k == 0 or i + 1 == n:
            up, ist = inner.update(acc, ist, ref)
            ref = optax_apply(ref, up)
            acc = {"w": jnp.zeros(4)}
    np.testing.assert_allclose(np.asarray(params["w"]), np.asarray(ref["w"]),
                               rtol=1e-5, atol=1e-7)


def optax_apply(params, updates):
    import optax
    return optax.apply_updates(params, updates)


def test_fit_flushes_accumulation_tail(tmp_path):
    """An epoch whose batch count isn't a multiple of k must end with an
    applied step and an empty window (no carry into the next epoch's LR)."""
    import jax

    from miseg_tpu.data.multi_modal import MultiModalData
    from miseg_tpu.data.synthetic import make_synthetic_dataset
    from miseg_tpu.train.engine import Trainer
    make_synthetic_dataset(tmp_path, shape=(24, 24, 24), num_classes=2,
                           n_train=3, n_val=1)
    cfg = Config(model_name="unet", roi_x=16, roi_y=16, roi_z=16,
                 out_channels=2, feature_size=[2], num_layers=2, strides=[2],
                 num_res_units=0, encoder_norm_name="instance",
                 decoder_norm_name="instance", criterion="dice_ce",
                 data_dirs=[str(tmp_path)], json_lists=["CT.json"],
                 max_epochs=1, check_val_every_n_epoch=5, batch_size=1,
                 patches_training_sample=1, iters_to_accumulate=2,
                 scheduler="none", cache_num=0, use_normal_dataset=True,
                 num_workers=0, no_amp=True, precision="fp32",
                 default_root_dir=str(tmp_path / "exp"))
    trainer = Trainer(cfg, workdir=str(tmp_path / "exp"))
    state = trainer.fit(MultiModalData(cfg))
    assert int(state.step) == 3            # 3 micro-batches
    ms = state.opt_state
    assert int(jax.device_get(ms.mini_step)) == 0         # window flushed
    assert int(jax.device_get(ms.gradient_step)) == 2     # ceil(3/2)


def test_checkpoint_roundtrip(tmp_path, rng):
    import jax.numpy as jnp

    from miseg_tpu.train.checkpoint import (CheckpointManager, load_checkpoint,
                                            save_checkpoint)
    params = {"a": {"w": jnp.asarray(rng.random((3, 2)), jnp.float32)}}
    save_checkpoint(tmp_path / "x.ckpt", params=params, epoch=7, best_acc=0.5)
    ck = load_checkpoint(tmp_path / "x.ckpt", params_template=params)
    assert np.allclose(np.asarray(ck["params"]["a"]["w"]),
                       np.asarray(params["a"]["w"]))
    assert ck["epoch"] == 7

    mgr = CheckpointManager(tmp_path / "ckpts", save_top_k=2)
    for e, acc in enumerate([0.1, 0.5, 0.3, 0.7]):
        mgr.save(acc, params=params, epoch=e)
    import os
    files = [f for f in os.listdir(tmp_path / "ckpts") if f.endswith(".ckpt")]
    assert "last.ckpt" in files
    assert len([f for f in files if f != "last.ckpt"]) == 2  # top-2 kept
    assert "0.7000" in mgr.best_path


def test_partial_load_skips_mismatched_head(rng):
    from miseg_tpu.train.pretrained import partial_load
    tgt = {"enc": {"w": np.zeros((3, 3))}, "out": {"w": np.zeros((3, 6))}}
    src = {"enc": {"w": np.ones((3, 3))}, "out": {"w": np.ones((3, 14))}}
    merged = partial_load(tgt, src, verbose=False)
    assert np.allclose(merged["enc"]["w"], 1.0)       # loaded
    assert np.allclose(merged["out"]["w"], 0.0)       # shape skip → init kept


def test_swin_vit_torch_import(tmp_path):
    """Round-trip a torch-style swin-ViT state dict into flax params."""
    import torch

    from miseg_tpu.train.pretrained import load_swin_vit_torch
    c = 6
    sd = {
        "module.patch_embed.proj.weight": torch.randn(c, 1, 2, 2, 2),
        "module.patch_embed.proj.bias": torch.randn(c),
        "module.layers1.0.blocks.0.norm1.weight": torch.randn(c),
        "module.layers1.0.blocks.0.norm1.bias": torch.randn(c),
        "module.layers1.0.blocks.0.attn.qkv.weight": torch.randn(3 * c, c),
        "module.layers1.0.blocks.0.mlp.fc1.weight": torch.randn(4 * c, c),
        "module.layers1.0.downsample.reduction.weight": torch.randn(2 * c, 8 * c),
    }
    torch.save({"state_dict": sd}, tmp_path / "swinvit.pt")
    params = {"swinViT": {
        "patch_embed": {"proj": {"kernel": np.zeros((2, 2, 2, 1, c)),
                                 "bias": np.zeros(c)}},
        "layers1": {"blocks_0": {
            "norm1": {"scale": np.zeros(c), "bias": np.zeros(c)},
            "attn": {"qkv": {"kernel": np.zeros((c, 3 * c))}},
            "mlp": {"linear1": {"kernel": np.zeros((c, 4 * c))}}},
            "downsample": {"reduction": {"kernel": np.zeros((8 * c, 2 * c))}}},
    }}
    out = load_swin_vit_torch(tmp_path / "swinvit.pt", params, verbose=False)
    sub = out["swinViT"]
    assert np.allclose(sub["patch_embed"]["proj"]["kernel"],
                       sd["module.patch_embed.proj.weight"].permute(2, 3, 4, 1, 0).numpy())
    assert np.allclose(sub["layers1"]["blocks_0"]["attn"]["qkv"]["kernel"],
                       sd["module.layers1.0.blocks.0.attn.qkv.weight"].numpy().T)
    assert np.allclose(sub["layers1"]["blocks_0"]["mlp"]["linear1"]["kernel"],
                       sd["module.layers1.0.blocks.0.mlp.fc1.weight"].numpy().T)


def test_tiny_fit_end_to_end(tmp_path):
    """2-epoch conditional UNet on synthetic CT+MR with eval + ckpt."""
    from miseg_tpu.data.multi_modal import MultiModalData
    from miseg_tpu.data.synthetic import make_synthetic_dataset
    from miseg_tpu.train.engine import Trainer
    make_synthetic_dataset(tmp_path, shape=(24, 24, 24), num_classes=2,
                           n_train=1, n_val=1, n_test=1)
    cfg = Config(model_name="unet", roi_x=16, roi_y=16, roi_z=16,
                 out_channels=2, feature_size=[2], num_layers=2, strides=[2],
                 num_res_units=1, encoder_norm_name="instance_cond",
                 decoder_norm_name="instance", criterion="dice_ce",
                 data_dirs=[str(tmp_path)] * 2, json_lists=["CT.json", "MR.json"],
                 max_epochs=2, check_val_every_n_epoch=1, batch_size=2,
                 patches_training_sample=1, scheduler="none", cache_num=0,
                 use_normal_dataset=True, num_workers=0, no_amp=True,
                 precision="fp32", patience=10,
                 default_root_dir=str(tmp_path / "exp"))
    trainer = Trainer(cfg, workdir=str(tmp_path / "exp"))
    state = trainer.fit(MultiModalData(cfg))
    assert int(state.step) == 2
    metrics = trainer.evaluate(MultiModalData(cfg).val_dataloader(), state)
    assert "val/accuracy/avg" in metrics
    assert "val_total_dice/avg" in metrics
    assert (tmp_path / "exp" / "best.ckpt").exists()
    # test-prefixed eval must NOT write into the val_* history namespaces
    tm = trainer.evaluate(MultiModalData(cfg).val_dataloader(), state,
                          prefix="test")
    assert "test_total_dice/avg" in tm
    assert "test_modality0_dice/avg" in tm
    assert not any(k.startswith("val") for k in tm)


def test_unet_freeze_mask_spares_decoder():
    """--freeze_encoder must freeze down/bottom but keep up/up_ru training
    (regression: a top-level 'model' prefix froze the whole network)."""
    import jax.numpy as jnp

    from miseg_tpu.models import UNet
    from miseg_tpu.train.optim import freeze_mask
    params = {"model": {
        "down": {"w": jnp.ones(1)},
        "sub": {"down": {"w": jnp.ones(1)}, "bottom": {"w": jnp.ones(1)},
                "up": {"w": jnp.ones(1)}, "up_ru": {"w": jnp.ones(1)}},
        "up": {"w": jnp.ones(1)}, "up_ru": {"w": jnp.ones(1)}}}
    labels = freeze_mask(params, UNet.ENCODER_PREFIXES)
    m = labels["model"]
    assert m["down"]["w"] == "freeze"
    assert m["sub"]["down"]["w"] == "freeze"
    assert m["sub"]["bottom"]["w"] == "freeze"
    assert m["sub"]["up"]["w"] == "train"
    assert m["sub"]["up_ru"]["w"] == "train"
    assert m["up"]["w"] == "train"


def test_batch_norm_trains_and_evals(tmp_path):
    """The 'batch' norm option must not crash and must update running stats."""
    import jax
    import jax.numpy as jnp

    from miseg_tpu.train.engine import Trainer
    cfg = Config(model_name="unet", roi_x=8, roi_y=8, roi_z=8, out_channels=2,
                 feature_size=[2], num_layers=2, strides=[2], num_res_units=0,
                 encoder_norm_name="batch", decoder_norm_name="batch",
                 criterion="dice_ce", scheduler="none", no_amp=True,
                 precision="fp32", default_root_dir=str(tmp_path))
    tr = Trainer(cfg, workdir=str(tmp_path))
    img = np.random.default_rng(0).random((2, 8, 8, 8, 1)).astype(np.float32)
    lab = np.zeros((2, 8, 8, 8), np.int32)
    state = tr.init_state(img[:1], np.zeros((1,), np.int32))
    assert "batch_stats" in state.extra_vars
    before = jax.tree.map(np.asarray, state.extra_vars)
    state, loss = tr.train_step(state, {"image": img, "label": lab,
                                        "modality": np.zeros(2, np.int32)})
    assert np.isfinite(float(loss))
    after = jax.tree.map(np.asarray, state.extra_vars)
    changed = any((a != b).any() for a, b in
                  zip(jax.tree.leaves(before), jax.tree.leaves(after)))
    assert changed  # running stats updated
    # eval path threads the collection too
    out = tr.apply_fn(state.params, jnp.asarray(img),
                      jnp.zeros(2, jnp.int32), extra_vars=state.extra_vars)
    assert out.shape == (2, 8, 8, 8, 2)


def test_fit_resume_from_checkpoint(tmp_path):
    """--ckpt_path resume restores params/epoch and continues training."""
    from miseg_tpu.data.multi_modal import MultiModalData
    from miseg_tpu.data.synthetic import make_synthetic_dataset
    from miseg_tpu.train.engine import Trainer
    make_synthetic_dataset(tmp_path, shape=(24, 24, 24), num_classes=2,
                           n_train=1, n_val=1)
    base = dict(model_name="unet", roi_x=16, roi_y=16, roi_z=16,
                out_channels=2, feature_size=[2], num_layers=2, strides=[2],
                num_res_units=0, encoder_norm_name="instance",
                decoder_norm_name="instance", criterion="dice_ce",
                data_dirs=[str(tmp_path)], json_lists=["CT.json"],
                check_val_every_n_epoch=1, batch_size=1,
                scheduler="none", cache_num=0, use_normal_dataset=True,
                num_workers=0, no_amp=True, precision="fp32", patience=100,
                default_root_dir=str(tmp_path / "exp"))
    cfg1 = Config(max_epochs=2, **base)
    t1 = Trainer(cfg1, workdir=str(tmp_path / "exp"))
    t1.fit(MultiModalData(cfg1))
    assert (tmp_path / "exp" / "last.ckpt").exists()

    cfg2 = Config(max_epochs=4, ckpt_path=str(tmp_path / "exp" / "last.ckpt"),
                  **base)
    t2 = Trainer(cfg2, workdir=str(tmp_path / "exp2"))
    state = t2.fit(MultiModalData(cfg2))
    # resumed at epoch 2 with the step counter CONTINUED from the restored
    # optimizer state (2 steps done) → 2 more epochs × 1 batch = 4 total.
    # The continued counter is what keeps the in-jit fold_in(key, step)
    # dropout stream from replaying steps 0..1 after a resume.
    assert int(state.step) == 4
    assert t2._host_step == 4  # rng stream resumed at 2, not 0


def test_checkpoint_manager_topk_survives_resume(tmp_path, rng):
    from miseg_tpu.train.checkpoint import CheckpointManager
    params = {"w": rng.random((4, 4)).astype("float32")}
    m1 = CheckpointManager(tmp_path, save_top_k=2)
    for epoch, acc in [(0, 0.3), (1, 0.7), (2, 0.5)]:
        m1.save(acc, params=params, epoch=epoch)
    best_before = m1.best_path
    assert "0.7000" in best_before
    # fresh manager (simulated restart) restores the top-k record
    m2 = CheckpointManager(tmp_path, save_top_k=2)
    assert m2.best_path == best_before
    # pruning still works after the restart: a new better ckpt evicts 0.5
    m2.save(0.9, params=params, epoch=3)
    import os
    names = sorted(os.listdir(tmp_path))
    assert not any("0.5000" in n for n in names)
    assert any("0.9000" in n for n in names)
    assert "0.9000" in m2.best_path


def test_scale_batch_size_power_mode():
    """Doubles until OOM, backs off to the last fitting size; non-OOM
    errors propagate; nothing-fits raises (PTL Tuner 'power' semantics,
    reference train.py:57-60)."""
    from miseg_tpu.train.tuner import scale_batch_size

    calls = []

    def fake_step(cfg, bs):
        calls.append(bs)
        if bs > 4:
            raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory in HBM")

    cfg = Config(batch_size=1)
    assert scale_batch_size(cfg, step_fn=fake_step, verbose=False) == 4
    assert calls == [1, 2, 4, 8]

    def broken_step(cfg, bs):
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError):
        scale_batch_size(cfg, step_fn=broken_step, verbose=False)

    def never_fits(cfg, bs):
        raise RuntimeError("RESOURCE_EXHAUSTED")

    with pytest.raises(RuntimeError, match="does not fit"):
        scale_batch_size(cfg, step_fn=never_fits, verbose=False)

    # max_trials caps the doubling when nothing ever OOMs
    assert scale_batch_size(cfg, step_fn=lambda c, b: None, max_trials=3,
                            verbose=False) == 4


def test_scale_batch_size_runs_real_step(tmp_path):
    """The default probe compiles + executes a real train step."""
    from miseg_tpu.train.tuner import scale_batch_size
    cfg = Config(model_name="unet", roi_x=8, roi_y=8, roi_z=8, out_channels=2,
                 feature_size=[2], num_layers=2, strides=[2], num_res_units=0,
                 encoder_norm_name="instance_cond", decoder_norm_name="instance",
                 criterion="dice_ce", scheduler="none", no_amp=True,
                 precision="fp32", batch_size=1,
                 default_root_dir=str(tmp_path))
    assert scale_batch_size(cfg, max_trials=2, verbose=False) == 2
