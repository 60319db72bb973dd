"""Pipeline parallelism (PP): a GPipe schedule over a mesh "pp" axis,
TPU-natively — `shard_map` + `lax.ppermute` over ICI + one `lax.scan`
of compile-time-static ticks (no per-stage processes, no send/recv
runtime like torch pipelines).

The reference has no PP (SURVEY §2.8 row "PP": absent; its only
parallelism is DDP).  These segmentation models fit on one chip, so PP
is not a parity requirement — it is the one mesh dimension the
parallel/ family (DP `mesh.py`, FSDP `fsdp.py`, SP `spatial.py`, TP
`tensor.py`) would otherwise lack.  It is wired as a real `Trainer`
mode: `Config.pipeline_parallel` GPipe-schedules UNETR's ViT encoder
(models/unetr_pp.py).  UNETR consumes hidden states after blocks
L/4, L/2, 3L/4 (reference networks/nets/unetr.py:254-276), which fall
INSIDE stages in general — the `with_aux` channel below returns every
in-stage layer output so the decoder can tap them for any stage count.

Design (classic GPipe on an SPMD mesh):

  * every pipeline stage runs the SAME `stage_fn` with its own slice of
    stage-stacked params (leading dim S sharded `P("pp")` — device s
    holds stage s);
  * the global batch splits into M microbatches; a scan over
    T = M + S - 1 ticks moves activations one stage per tick via
    `ppermute` (device s processes microbatch t - s at tick t, bubble
    fraction (S-1)/T);
  * activations must keep ONE shape across stages (true for transformer
    stacks); inactive ticks compute on garbage and write to a spare
    buffer slot — branchless, so the whole schedule is one XLA program;
  * backward is `jax.grad` through the scan: ppermute transposes to the
    reverse permute, giving the standard GPipe backward schedule with
    rematerialized stage activations (wrap `stage_fn` in
    `jax.checkpoint` for the textbook memory profile).

Composes with DP on a 2-D ("data", "pp") mesh: batch inputs sharded
`P("data")` are simply smaller per-device microbatches; params stay
`P("pp")` (replicated over "data").
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stages(layer_params: list, n_stages: int):
    """Stack per-layer param trees `[L]` into a stage-stacked tree.

    Every leaf gains leading dims `[S, L // S]`; shard dim 0 on "pp".
    Layers must divide stages evenly and share one tree structure (true
    for a homogeneous transformer stack such as ViT's `blocks_i`).
    """
    n_layers = len(layer_params)
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers do not split into "
                         f"{n_stages} equal stages")
    per = n_layers // n_stages
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *layer_params)
    return jax.tree.map(
        lambda a: a.reshape((n_stages, per) + a.shape[1:]), stacked)


def pipeline_spec(stacked_params, mesh: Mesh, axis: str = "pp"):
    """NamedShardings placing each stage's slice on its device row."""
    def rule(leaf):
        ndim = np.ndim(leaf)
        return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))
    return jax.tree.map(rule, stacked_params)


def pipeline_apply(stage_fn: Callable, stacked_params, x, *extra,
                   mesh: Mesh, axis: str = "pp", microbatches: int,
                   data_axis: str | None = None, with_aux: bool = False):
    """Run S pipeline stages over `x [B, ...]`, GPipe-scheduled.

    `stage_fn(stage_params, h, *extra_mb)` maps one activation microbatch
    `[B/M, ...]` through one stage and must preserve its shape.
    `stacked_params` leaves carry leading dim S (see `stack_stages` — for
    multi-layer stages the second dim is layers-per-stage, for `stage_fn`
    to loop over).  `extra` pytrees are per-SAMPLE side inputs (e.g. the
    `modalities` vector) microbatched alongside `x`.

    Returns `ys [S, B, ...]`: the activation after every stage —
    `ys[-1]` is the pipeline output.

    With `with_aux=True`, `stage_fn` must return `(h, aux)` where `aux`
    is `[k, *h.shape]` for a fixed k — e.g. `[layers_per_stage,
    *h.shape]`, the per-LAYER outputs a UNETR-style decoder taps: hidden
    state i lives at `aux_ys[i // per, i % per]`.  Returns `(ys, aux_ys)`
    with `aux_ys [S, k, B, ...]` (the microbatch dim re-merged into B).

    With `data_axis`, runs hybrid DP x PP on a 2-D mesh: `x`/`extra`
    are sharded on the batch axis, params replicated across it.
    """
    n_stages = int(mesh.shape[axis])
    m = int(microbatches)
    if m < 1:
        raise ValueError("microbatches must be >= 1")

    bspec = P(data_axis) if data_axis else P()
    out_spec = (P(axis, data_axis), P(axis, None, data_axis)) if with_aux \
        else P(axis, data_axis)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(jax.tree.map(
                      lambda leaf: P(axis, *([None] * (np.ndim(leaf) - 1))),
                      stacked_params),
                  bspec, jax.tree.map(lambda _: bspec, extra)),
        out_specs=out_spec,
        check_vma=False)
    def run(stacked, xb, extras):
        # local param slice: drop the sharded leading stage dim (=1 here)
        stage_params = jax.tree.map(lambda a: a[0], stacked)
        s = jax.lax.axis_index(axis)
        batch = xb.shape[0]
        if batch % m:
            raise ValueError(f"batch {batch} not divisible by "
                             f"{m} microbatches")
        mb = batch // m
        x_mb = xb.reshape((m, mb) + xb.shape[1:])
        ex_mb = jax.tree.map(
            lambda a: a.reshape((m, mb) + a.shape[1:]), extras)

        # buffer slot m is the garbage bin for inactive ticks
        buf = jnp.zeros((m + 1, mb) + xb.shape[1:], x_mb.dtype)
        h0 = jnp.zeros((mb,) + xb.shape[1:], x_mb.dtype)
        abuf = None
        if with_aux:
            h_spec = jax.ShapeDtypeStruct(h0.shape, h0.dtype)
            e_spec = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape[1:], a.dtype), ex_mb)
            _, aux_spec = jax.eval_shape(
                lambda p, h, e: stage_fn(p, h, *e),
                stage_params, h_spec, e_spec)
            if aux_spec.shape[-h0.ndim:] != h0.shape or \
                    len(aux_spec.shape) != h0.ndim + 1:
                raise ValueError("aux must be [k, *h.shape], got "
                                 f"{aux_spec.shape} for h {h0.shape}")
            abuf = jnp.zeros((m + 1,) + aux_spec.shape, aux_spec.dtype)
        fwd_perm = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(carry, t):
            h_recv, out, aout = carry
            mi = t - s                      # this device's microbatch index
            active = (mi >= 0) & (mi < m)
            mc = jnp.clip(mi, 0, m - 1)
            x_in = jax.lax.dynamic_index_in_dim(x_mb, mc, 0, keepdims=False)
            h_in = jnp.where(s == 0, x_in, h_recv)
            e_in = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, mc, 0,
                                                       keepdims=False),
                ex_mb)
            if with_aux:
                h_out, aux = stage_fn(stage_params, h_in, *e_in)
            else:
                h_out = stage_fn(stage_params, h_in, *e_in)
            if h_out.shape != h_in.shape or h_out.dtype != h_in.dtype:
                raise ValueError("stage_fn must preserve activation "
                                 f"shape/dtype, got {h_out.shape} "
                                 f"{h_out.dtype} from {h_in.shape} "
                                 f"{h_in.dtype}")
            slot = jnp.where(active, mc, m)
            out = jax.lax.dynamic_update_index_in_dim(out, h_out, slot, 0)
            if with_aux:
                aout = jax.lax.dynamic_update_index_in_dim(aout, aux, slot, 0)
            h_next = jax.lax.ppermute(h_out, axis, fwd_perm)
            return (h_next, out, aout), None

        (_, buf, abuf), _ = jax.lax.scan(tick, (h0, buf, abuf),
                                         jnp.arange(m + n_stages - 1))
        ys = buf[:m]                          # [M, mb, ...]
        ys = ys.reshape((batch,) + ys.shape[2:])
        if with_aux:
            a = abuf[:m]                      # [M, *lead, mb, ...]
            lead = a.shape[1:-1 - (len(xb.shape) - 1)]
            # merge the microbatch dim back into batch: [*lead, B, ...]
            a = jnp.moveaxis(a, 0, len(lead))   # [*lead, M, mb, ...]
            a = a.reshape(lead + (batch,) + xb.shape[1:])
            return ys[None], a[None]
        return ys[None]                       # [1(stage), local batch, ...]

    return run(stacked_params, x, extra)


def pipeline_apply_hetero(stage_fns: list, params, x, *extra,
                          mesh: Mesh, axis: str = "pp", microbatches: int,
                          data_axis: str | None = None):
    """GPipe with HETEROGENEOUS stages: one `stage_fns[s]` per pipeline
    rank, selected at runtime by `lax.switch` on the device's mesh
    coordinate.

    Unlike `pipeline_apply` (homogeneous stage-stacked params), each
    stage here may have its own parameter shapes — `params` is passed
    replicated and every branch closes over whatever slice it needs.
    This fits shape-CHANGING stacks (e.g. a swin backbone whose
    PatchMerging halves spatial dims and doubles channels per stage):
    stages exchange activations in ONE canonical shape (e.g. a flat
    `[B/M, F]` buffer sized for the largest stage, with each `stage_fn`
    reshaping its prefix in and padding its output back out).

    `stage_fns[s](params, h, *extra_mb) -> h'` must preserve the
    canonical shape/dtype.  Returns `ys [S, B, ...]` — `ys[s]` is the
    activation AFTER stage s (so stage outputs at every boundary are
    available for pyramid-style decoders without an aux channel).
    """
    n_stages = int(mesh.shape[axis])
    if len(stage_fns) != n_stages:
        raise ValueError(f"{len(stage_fns)} stage_fns for a {n_stages}-way "
                         f"'{axis}' mesh axis")
    m = int(microbatches)
    if m < 1:
        raise ValueError("microbatches must be >= 1")

    bspec = P(data_axis) if data_axis else P()

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), params),
                  bspec, jax.tree.map(lambda _: bspec, extra)),
        out_specs=P(axis, data_axis),
        check_vma=False)
    def run(p, xb, extras):
        s = jax.lax.axis_index(axis)
        batch = xb.shape[0]
        if batch % m:
            raise ValueError(f"batch {batch} not divisible by "
                             f"{m} microbatches")
        mb = batch // m
        x_mb = xb.reshape((m, mb) + xb.shape[1:])
        ex_mb = jax.tree.map(
            lambda a: a.reshape((m, mb) + a.shape[1:]), extras)

        branches = [lambda h, e, f=fn: f(p, h, *e) for fn in stage_fns]

        buf = jnp.zeros((m + 1, mb) + xb.shape[1:], x_mb.dtype)
        h0 = jnp.zeros((mb,) + xb.shape[1:], x_mb.dtype)
        fwd_perm = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(carry, t):
            h_recv, out = carry
            mi = t - s
            active = (mi >= 0) & (mi < m)
            mc = jnp.clip(mi, 0, m - 1)
            x_in = jax.lax.dynamic_index_in_dim(x_mb, mc, 0, keepdims=False)
            h_in = jnp.where(s == 0, x_in, h_recv)
            e_in = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, mc, 0,
                                                       keepdims=False),
                ex_mb)
            h_out = jax.lax.switch(s, branches, h_in, e_in)
            if h_out.shape != h_in.shape or h_out.dtype != h_in.dtype:
                raise ValueError("stage_fns must preserve the canonical "
                                 f"activation shape/dtype, got {h_out.shape} "
                                 f"{h_out.dtype} from {h_in.shape} "
                                 f"{h_in.dtype}")
            slot = jnp.where(active, mc, m)
            out = jax.lax.dynamic_update_index_in_dim(out, h_out, slot, 0)
            h_next = jax.lax.ppermute(h_out, axis, fwd_perm)
            return (h_next, out), None

        (_, buf), _ = jax.lax.scan(tick, (h0, buf),
                                   jnp.arange(m + n_stages - 1))
        ys = buf[:m].reshape((batch,) + xb.shape[1:])
        return ys[None]

    return run(params, x, extra)


def place_pipeline_params(stacked_params, mesh: Mesh, axis: str = "pp"):
    """Device-put a stage-stacked tree onto its pipeline placement."""
    return jax.device_put(stacked_params,
                          pipeline_spec(stacked_params, mesh, axis))
