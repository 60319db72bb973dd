"""Configuration: one dataclass covering the reference's full CLI surface.

The reference is argparse-only, with three composable groups
(utils/parser.py:5-149: model/loss/optim/sched/inference/early-stop/ckpt/
wandb, data, tune) plus PTL Trainer flags.  Here the same knobs live on a
single `Config` dataclass; `build_parser()` auto-generates an argparse CLI
from the fields (same flag names as the reference), and `Config.from_args`
round-trips a parsed namespace.  TPU-specific additions (precision, mesh,
seed) are grouped at the bottom.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Any


def _lst(*xs):
    return field(default_factory=lambda: list(xs))


@dataclass
class Config:
    # --- model group (utils/parser.py:5-108) ---
    pretrained: str | None = None      # path to pre-trained model checkpoint
    ckpt_path: str | None = None       # training checkpoint to resume from
    model_name: str = "unetr"          # unetr|unet|unet_vanilla|swin_unetr|pre_swin_unetr
    in_channels: int = 1
    out_channels: int = 14
    roi_x: int = 96
    roi_y: int = 96
    roi_z: int = 96
    feature_size: list[int] = _lst(16)  # scalar-ized for non-vanilla models (train.py:83-84)
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    pos_embed: str = "perceptron"
    no_conv_block: bool = False
    no_res_block: bool = False
    dropout_rate: float = 0.0
    spatial_dims: int = 3
    qkv_bias: bool = False
    vit_norm_name: str = "layer"
    vit_norm_no_affine: bool = False
    encoder_norm_name: str = "instance"
    encoder_norm_no_affine: bool = False
    decoder_norm_name: str = "instance"
    decoder_norm_no_affine: bool = False
    num_groups: int = 4
    num_styles: int = 2
    # swin-unetr specific
    dropout_path_rate: float = 0.0
    attn_drop_rate: float = 0.0
    depth_swin_block: list[int] = _lst(2)
    use_checkpoint: bool = False
    downsample: str = "merging"
    no_normalize_swin: bool = False
    pre_swin: str = ""                 # path to MONAI model_swinvit.pt
    # unet specific
    num_layers: int = 4
    strides: list[int] = _lst(2, 2, 2)
    kernel_size: list[int] = _lst(3)
    up_kernel_size: list[int] = _lst(3)
    num_res_units: int = 2
    activation: str = "prelu"
    no_bias: bool = False
    adn_ordering: str = "NDA"
    freeze_encoder: bool = False
    # loss
    criterion: str = "dice_focal"
    squared_dice: bool = False
    smooth_nr: float = 0.0
    smooth_dr: float = 1e-6
    no_include_background: bool = False
    # optimizer
    lr: float = 1e-4
    optim_name: str = "adamw"
    reg_weight: float = 1e-5
    momentum: float = 0.99
    # scheduler
    scheduler: str = "reduce_on_plateau"
    warmup_epochs: int = 50
    patience_scheduler: int = 3
    t_max: int = 200
    cycles: float = 0.5
    # inference
    infer_overlap: float = 0.5
    sw_batch_size: int = 1
    infer_cpu: bool = False
    # per-window-group progress ticks (reference predict_whs.py:78
    # `progress=True`); off by default — on the jitted device path each
    # tick is an async host callback, a round-trip on remote backends
    infer_progress: bool = False
    # early stop
    patience: int = 6
    min_delta: float = 0.001
    # checkpointing
    save_top_k: int = 3
    # logger
    experiment_name: str | None = None
    group: str | None = None
    project: str | None = None
    entity: str | None = None
    wandb_mode: str = "online"
    # adversarial stubs (parser.py:106-107)
    source: int | None = None
    alpha_reversal: float = 1.0

    # --- data group (utils/parser.py:111-132) ---
    data_dirs: list[str] = _lst("dataset/MM-WHS", "dataset/MM-WHS")
    json_lists: list[str] = _lst("CT_fold1.json", "MR.json")
    space_x: float = 1.0
    space_y: float = 1.0
    space_z: float = 1.0
    patches_training_sample: int = 1
    randFlipd_prob: float = 0.2
    randRotate90d_prob: float = 0.2
    randScaleIntensityd_prob: float = 0.1
    randShiftIntensityd_prob: float = 0.1
    use_normal_dataset: bool = False
    cache_num: int = 24
    loader_workers: int = 8
    batch_size: int = 1
    num_workers: int = 8

    # --- tune/train group (utils/parser.py:135-149) ---
    study_name: str = "experiment"
    n_trials: int | None = None
    timeout: int | None = None
    max_epochs: int = 2
    check_val_every_n_epoch: int = 1
    no_gpu: bool = False
    no_amp: bool = False
    # trainer.tune batch half (train.py:57-60 PTL Tuner): double the batch
    # until a train step OOMs, back off, and train at the result
    auto_scale_batch_size: bool = False
    iters_to_accumulate: int = 1
    default_root_dir: str = "./experiments"
    port: str = "23456"
    storage_name: str = "MI-Seg"
    min_lr: float = 1e-5
    max_lr: float = 5e-3

    # --- TPU-native additions (no reference analog) ---
    precision: str = "bf16"            # "bf16" | "fp32" compute policy
    seed: int = 0
    mesh_shape: list[int] = _lst(-1)   # data-parallel mesh; -1 = all devices
    mesh_axes: list[str] = _lst("data")
    fsdp: bool = False                 # ZeRO-3: shard params+opt over fsdp_axis
    fsdp_axis: str = "data"            # mesh axis for param sharding
    fsdp_min_size: int = 8192          # leaves below this many elems replicate
    spatial_shard: bool = False        # SP: shard patch dim D over spatial_axis
    spatial_axis: str = "sp"           # mesh axis for spatial partitioning
    tensor_parallel: bool = False      # TP: Megatron-shard transformer matmuls
    tp_axis: str = "model"             # mesh axis for tensor parallelism
    pipeline_parallel: bool = False    # PP: GPipe UNETR ViT / swin stages
    pp_axis: str = "pp"                # mesh axis for pipeline stages
    pp_microbatches: int = 2           # GPipe microbatches per step
    export_dir: str = "./export_bundle"  # cli.export output bundle path
    export_platforms: list[str] = _lst("tpu", "cpu")  # AOT lowering targets
    export_check: bool = False         # round-trip the bundle after export
    # canonical volume shapes ("224x224x224" each) to AOT-export whole
    # sliding-window programs for — serve.ServedModel.predict fast path
    export_volume_shapes: list[str] = _lst()
    # bake the weights into the exported volume programs as module
    # constants: recovers the live model's steady-state throughput (the
    # params-as-argument calling convention measured 0.83× on v5e,
    # BASELINE.md round 4) at the cost of a live-model-sized first
    # compile and a weights-sized artifact per program
    export_bake_params: bool = False
    profile_dir: str | None = None     # jax.profiler trace output
    log_every_n_steps: int = 10

    @property
    def feature_size_scalar(self) -> int:
        fs = self.feature_size
        return fs[0] if isinstance(fs, (list, tuple)) else int(fs)

    @property
    def roi(self) -> tuple[int, ...]:
        return (self.roi_x, self.roi_y, self.roi_z)[: self.spatial_dims]

    @property
    def spacing(self) -> tuple[float, ...]:
        return (self.space_x, self.space_y, self.space_z)[: self.spatial_dims]

    @property
    def include_background(self) -> bool:
        return not self.no_include_background

    @property
    def amp(self) -> bool:
        return not self.no_amp and self.precision == "bf16"

    @classmethod
    def from_args(cls, args: argparse.Namespace) -> "Config":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in vars(args).items() if k in known})

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _scalar_or_list(values):
    """Mirror train.py:83-84: single-element int lists collapse to the int."""
    if isinstance(values, (list, tuple)) and len(values) == 1:
        return int(values[0])
    return values


def build_parser(parser: argparse.ArgumentParser | None = None) -> argparse.ArgumentParser:
    """Argparse CLI auto-generated from `Config` (same flags as the reference)."""
    parser = parser or argparse.ArgumentParser(description="miseg_tpu")
    for f in dataclasses.fields(Config):
        flag = f"--{f.name}"
        if f.type == "bool" or f.type is bool:
            parser.add_argument(flag, action="store_true", default=f.default)
        elif f.default_factory is not dataclasses.MISSING:  # list field
            default = f.default_factory()
            elem = type(default[0]) if default else str
            parser.add_argument(flag, nargs="+", type=elem, default=default)
        else:
            typ = {int: int, float: float, str: str}.get(type(f.default), str)
            if f.default is None:
                # typed by annotation: "int | None" → int, else str
                typ = int if "int" in str(f.type) else str
            parser.add_argument(flag, type=typ, default=f.default)
    return parser


def parse_config(argv: list[str] | None = None) -> Config:
    args = build_parser().parse_args(argv)
    return Config(**vars(args))
