#!/usr/bin/env python
"""Profile the flagship forward / train step on TPU and print a per-op time
table (parsed from the jax.profiler xplane trace).

The round-1 roofline said the C-Swin-UNETR forward is HBM-bound at ~31GB
traffic per window; this tool answers WHERE the time goes (per fused-op
breakdown) so kernel work targets the real hot spots instead of guesses.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_tpu.py \
      [--mode forward|train|infer] [--fs 48] [--roi 96] [--sw-bs 1] [--top 30]
"""

from __future__ import annotations

import argparse
import functools
import glob
import gzip
import os
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _xspace_class():
    """Build the XSpace protobuf class from tensorflow's shipped descriptor
    set (the python module isn't exported in this tf build)."""
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory
    import tensorflow
    root = os.path.dirname(tensorflow.__file__)
    path = os.path.join(root, "include/tensorflow/tsl/profiler/protobuf/"
                        "xplane_proto-descriptor-set.proto.bin")
    fds = descriptor_pb2.FileDescriptorSet()
    with open(path, "rb") as f:
        fds.ParseFromString(f.read())
    pool = descriptor_pool.DescriptorPool()
    for fd in fds.file:
        pool.Add(fd)
    return message_factory.GetMessageClass(
        pool.FindMessageTypeByName("tensorflow.profiler.XSpace"))


def parse_trace(logdir: str, top: int = 30) -> list[tuple[str, float, int]]:
    """Aggregate per-op durations from the TPU device planes.

    Returns [(op_name, total_ms, count)] sorted by time desc.
    """
    files = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    XSpace = _xspace_class()
    space = XSpace()
    with open(files[-1], "rb") as f:
        space.ParseFromString(f.read())
    totals: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    for plane in space.planes:
        name = plane.name
        # device planes: "/device:TPU:0" or "TPU:0"; skip host threads
        if "TPU" not in name or "host" in name.lower():
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            # XLA op lines carry per-op events; step lines summarize
            for ev in line.events:
                nm = ev_names.get(ev.metadata_id, "?")
                dur_ms = ev.duration_ps / 1e9
                totals[nm] += dur_ms
                counts[nm] += 1
    rows = sorted(totals.items(), key=lambda t: -t[1])[:top]
    return [(n, t, counts[n]) for n, t in rows]


def build_flagship(fs: int, roi: int, out_ch: int = 6):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from miseg_tpu.config import Config
    from miseg_tpu.models import model_from_config

    cfg = Config(model_name="swin_unetr", out_channels=out_ch,
                 feature_size=[fs], num_heads=3,
                 roi_x=roi, roi_y=roi, roi_z=roi,
                 encoder_norm_name="instance_cond",
                 vit_norm_name="instance_cond",
                 decoder_norm_name="instance")
    model = model_from_config(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, roi, roi, roi, 1), np.float32))
    mods = jnp.zeros((1,), jnp.int32)
    variables = model.init({"params": jax.random.key(0)}, x, mods)
    return cfg, model, variables, x, mods


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="forward",
                   choices=["forward", "train", "infer"])
    p.add_argument("--fs", type=int, default=48)
    p.add_argument("--roi", type=int, default=96)
    p.add_argument("--sw-bs", type=int, default=1)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--logdir", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from miseg_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    cfg, model, variables, x, mods = build_flagship(args.fs, args.roi)
    params_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables["params"])

    if args.mode == "forward":
        bs = args.batch
        xb = jnp.broadcast_to(x, (bs, *x.shape[1:])).copy()
        mb = jnp.zeros((bs,), jnp.int32)

        @jax.jit
        def fn(p, w, m):
            return model.apply({"params": p}, w.astype(jnp.bfloat16), m)
        run = lambda: fn(params_bf16, xb, mb)
    elif args.mode == "train":
        import optax
        from miseg_tpu.losses import loss_from_config
        loss_fn = loss_from_config(cfg.replace(criterion="dice_focal"))
        tx = optax.adamw(1e-4)
        params = variables["params"]
        opt_state = tx.init(params)
        label = jnp.asarray(np.random.default_rng(1).integers(
            0, cfg.out_channels, (1, args.roi, args.roi, args.roi)), jnp.int32)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(p, o, image, lab, m):
            def loss_of(pp):
                pc = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                                  if a.dtype == jnp.float32 else a, pp)
                logits = model.apply({"params": pc}, image.astype(jnp.bfloat16),
                                     m, train=True).astype(jnp.float32)
                return loss_fn(logits, lab)
            loss, grads = jax.value_and_grad(loss_of)(p)
            up, o = tx.update(grads, o, p)
            return optax.apply_updates(p, up), o, loss

        def run():
            nonlocal params, opt_state
            params, opt_state, l = step(params, opt_state, x, label, mods)
            return l
    else:  # infer: full sliding-window volume
        from miseg_tpu.inferers import SlidingWindowInferer
        roi3 = (args.roi,) * 3
        vol = jnp.asarray(np.random.default_rng(0).random(
            (1, 224, 224, 224, 1), np.float32))

        def predict(w, m):
            return model.apply({"params": params_bf16},
                               w.astype(jnp.bfloat16), m).astype(jnp.float32)
        inferer = SlidingWindowInferer(predict, roi_size=roi3,
                                       sw_batch_size=args.sw_bs, overlap=0.5,
                                       mode="gaussian",
                                       out_channels=cfg.out_channels)
        run = lambda: inferer(vol, jnp.zeros((1,), jnp.int32))

    # block_until_ready does NOT wait for execution on the tunneled
    # backend; the only true sync is a host fetch of dependent data.
    fetch = jax.jit(lambda o: jax.tree.leaves(o)[0].ravel()[0])

    def sync(out):
        np.asarray(fetch(out))

    # compile + warm
    t0 = time.perf_counter()
    sync(run())
    print(f"# compile+warm {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def run_n(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = run()
        sync(out)
        return time.perf_counter() - t0

    t1, t2 = run_n(args.reps), run_n(3 * args.reps)
    wall = (t2 - t1) / (2 * args.reps)  # slope cancels round-trip constants
    print(f"# steady-state {wall * 1e3:.1f} ms/call", file=sys.stderr)

    logdir = args.logdir or tempfile.mkdtemp(prefix="miseg_prof_")
    with jax.profiler.trace(logdir):
        out = None
        for _ in range(args.reps):
            out = run()
        sync(out)
    print(f"# trace at {logdir}", file=sys.stderr)
    rows = parse_trace(logdir, args.top)
    total = sum(t for _, t, _ in rows)
    print(f"{'op':72s} {'ms':>9s} {'n':>5s}")
    for n, t, c in rows:
        print(f"{n[:72]:72s} {t / args.reps:9.3f} {c:5d}")
    print(f"# top-{args.top} total {total / args.reps:.1f} ms/call "
          f"(wall {wall * 1e3:.1f})")


if __name__ == "__main__":
    main()
