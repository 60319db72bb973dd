"""On-device sliding-window inference with overlap blending.

Re-implements `monai.inferers.sliding_window_inference` as used by the
reference (lightning_monai.py:86-93, tune.py:141-147, test.py:153-159,
predict_whs.py): tile an arbitrary-size volume into fixed ROIs on a
regular grid (`scan_interval = roi * (1 - overlap)`), run the predictor on
window batches, blend with a constant or gaussian importance map, and
normalize.

TPU-first design (SURVEY §7.3 — this is where the throughput target is
won):
  * the whole tile→predict→blend→normalize pipeline is ONE jitted program
    per (padded shape, roi, overlap) bucket: window extraction is
    `lax.dynamic_slice` inside a `lax.scan`, blending is on-device
    read-modify-write into HBM-resident accumulators — zero host
    round-trips per window;
  * volumes are padded so windows tile exactly, bounding the number of
    compile variants; results are cropped back;
  * `sw_batch_size` windows are predicted per scan step (batched MXU
    work); the per-sample modality id is broadcast to the window batch —
    our vectorized cond-norm lifts the reference's sw_batch_size=1
    restriction (conditional_instance_norm.py:46-47);
  * `infer_cpu` (host stitching to cap HBM, lightning_monai.py:92) maps to
    `stitch_on_host=True`: prediction stays on device, accumulation in
    host numpy.
"""

from __future__ import annotations

import functools
import itertools
import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def scan_interval(roi_size: Sequence[int], overlap: float) -> tuple[int, ...]:
    """MONAI's per-dim scan interval: int(roi * (1 - overlap)), min 1."""
    return tuple(max(1, int(r * (1.0 - overlap))) for r in roi_size)


def dense_patch_starts(image_size: Sequence[int], roi_size: Sequence[int],
                       interval: Sequence[int]) -> np.ndarray:
    """Grid of window start corners `[N, nd]` (MONAI dense_patch_slices)."""
    per_dim = []
    for size, roi, step in zip(image_size, roi_size, interval):
        if size <= roi:
            per_dim.append([0])
            continue
        n = int(math.ceil((size - roi) / step)) + 1
        starts = [min(i * step, size - roi) for i in range(n)]
        # dedupe while preserving order (clipping can collide)
        seen, uniq = set(), []
        for s in starts:
            if s not in seen:
                seen.add(s)
                uniq.append(s)
        per_dim.append(uniq)
    return np.array(list(itertools.product(*per_dim)), dtype=np.int32)


def gaussian_importance(roi_size: Sequence[int], sigma_scale: float = 0.125) -> np.ndarray:
    """Gaussian blend map centered on the ROI (MONAI GaussianFilter analog)."""
    grids = np.meshgrid(*[np.arange(r, dtype=np.float64) for r in roi_size],
                        indexing="ij")
    out = np.zeros(tuple(roi_size), dtype=np.float64)
    for g, r in zip(grids, roi_size):
        sigma = max(r * sigma_scale, 1e-3)
        center = (r - 1) / 2.0
        out = out + (-0.5 * ((g - center) / sigma) ** 2)
    out = np.exp(out)
    out = out / out.max()
    # clamp tiny values so normalization never divides by ~0 (MONAI min clip)
    return np.maximum(out, out.max() * 1e-3).astype(np.float32)


def _cell_geometry(grid: Sequence[int], roi: Sequence[int],
                   interval: Sequence[int]):
    """Shared cell-grid geometry for the overlap-add blend.

    Single source of truth for ratios (cells/window, ceil), the
    cell-padded window ROI, and the accumulator/normalizer spatial shape —
    `_sw_core_overlap_add` and `_overlap_count` must agree exactly.
    """
    ratios = tuple(-(-r // s) for r, s in zip(roi, interval))
    cell_roi = tuple(rt * s for rt, s in zip(ratios, interval))
    acc_shape = tuple((g + rt - 1) * s
                      for g, rt, s in zip(grid, ratios, interval))
    return ratios, cell_roi, acc_shape


def _pad_to_grid(spatial: Sequence[int], roi_size: Sequence[int],
                 interval: Sequence[int]) -> tuple[int, ...]:
    """Smallest padded size ≥ max(spatial, roi) with (size - roi) % step == 0."""
    out = []
    for s, r, st in zip(spatial, roi_size, interval):
        s = max(s, r)
        rem = (s - r) % st
        out.append(s if rem == 0 else s + (st - rem))
    return tuple(out)


def _sw_core(predict_fn: Callable, x: Array, modalities: Array | None,
             starts: Array, importance: Array, *, roi: tuple[int, ...],
             sw_batch_size: int, out_channels: int) -> Array:
    """Jittable tile→predict→blend over one padded volume.

    x: [B, *padded, C]; starts: [Ng, sw_batch_size, nd] grouped window
    corners (groups padded by repeating the last window — harmless, the
    blend normalizes).  Returns normalized logits [B, *padded, out_channels].
    """
    b = x.shape[0]
    padded = x.shape[1:-1]
    nd = len(roi)
    acc = jnp.zeros((b, *padded, out_channels), jnp.float32)
    cnt = jnp.zeros((1, *padded, 1), jnp.float32)
    imp = importance.reshape(1, *roi, 1).astype(jnp.float32)

    def extract(start):
        return jax.lax.dynamic_slice(
            x, (0, *[start[i] for i in range(nd)], 0), (b, *roi, x.shape[-1]))

    def step(carry, group):
        acc, cnt = carry
        # [k, B, *roi, C] → [k*B, *roi, C]
        windows = jax.vmap(extract)(group)
        kb = windows.shape[0] * b
        windows = windows.reshape(kb, *roi, x.shape[-1])
        if modalities is not None:
            mods = jnp.tile(modalities, windows.shape[0] // b)
        else:
            mods = None
        logits = predict_fn(windows, mods).astype(jnp.float32)  # [k*B, *roi, O]
        logits = logits.reshape(-1, b, *roi, out_channels) * imp[None]

        def add_one(i, carry):
            acc, cnt = carry
            start = group[i]
            idx = (0, *[start[j] for j in range(nd)], 0)
            cur = jax.lax.dynamic_slice(acc, idx, (b, *roi, out_channels))
            acc = jax.lax.dynamic_update_slice(acc, cur + logits[i], idx)
            curc = jax.lax.dynamic_slice(cnt, idx[:1] + idx[1:-1] + (0,),
                                         (1, *roi, 1))
            cnt = jax.lax.dynamic_update_slice(cnt, curc + imp,
                                               idx[:1] + idx[1:-1] + (0,))
            return acc, cnt

        acc, cnt = jax.lax.fori_loop(0, logits.shape[0], add_one, (acc, cnt))
        return (acc, cnt), None

    (acc, cnt), _ = jax.lax.scan(step, (acc, cnt), starts)
    return acc / cnt


def _sw_core_overlap_add(predict_fn: Callable, x: Array,
                         modalities: Array | None, starts: Array,
                         importance: Array, count: Array, *,
                         grid: tuple[int, ...], roi: tuple[int, ...],
                         interval: tuple[int, ...],
                         out_channels: int, mesh=None,
                         batch_windows: bool = False,
                         progress_cb: Callable | None = None) -> Array:
    """Static overlap-add blend for regular-stride window grids.

    The scan/dynamic-update-slice accumulator in `_sw_core` is correct but
    compile-pathological on some TPU toolchains (minutes-long layout
    analysis of in-loop DUS over a multi-hundred-MB buffer).  On a
    regular-stride grid every window subdivides into ceil(roi/step)^nd
    step-sized cells (windows are zero-padded up to whole cells when the
    step does not divide the ROI — padded cells contribute zeros to both
    accumulator and normalizer), so blending becomes a STATIC pad-and-add
    of shifted copies — no dynamic updates anywhere.

    count (the blend normalizer) is a host-precomputed constant.
    """
    b = x.shape[0]
    nd = len(roi)
    imp = importance.reshape(1, *roi, 1).astype(jnp.float32)

    def scan_windows(x, modalities, starts, imp):
        def extract(start):
            return jax.lax.dynamic_slice(
                x, (0, *[start[i] for i in range(nd)], 0),
                (b, *roi, x.shape[-1]))

        def step(_, group):
            windows = jax.vmap(extract)(group)      # [k, B, *roi, C]
            k = windows.shape[0]
            if k > 1 and not batch_windows:
                # groups run as a SERIAL map: measured on v5e, batching
                # windows through the model is 2.2x slower per window —
                # at batch>=2 XLA stops fusing the instance-norm stats
                # reductions at full resolution and materializes paired
                # f32 tensors (e.g. `(f32[96,96,16,13,48], f32[...])`
                # fusions ~2GB each), quadrupling physical HBM traffic
                # (26.3 -> 103.6 GB for 2 windows; BASELINE.md round 2)
                if modalities is not None:
                    logits = jax.lax.map(
                        lambda wm: predict_fn(wm[0], wm[1]),
                        (windows, jnp.broadcast_to(modalities, (k, b))))
                else:
                    logits = jax.lax.map(lambda w: predict_fn(w, None),
                                         windows)
                logits = logits.astype(jnp.float32)
            else:
                flat = windows.reshape(k * b, *roi, x.shape[-1])
                mods = (jnp.tile(modalities, k)
                        if modalities is not None else None)
                logits = predict_fn(flat, mods).astype(jnp.float32)
                logits = logits.reshape(k, b, *roi, out_channels)
            logits = logits * imp[None]
            if progress_cb is not None:
                # opt-in per-group tick (reference predict_whs.py:78
                # `progress=True`); unordered so it never serializes the
                # scan — costs one host round-trip per group on remote
                # backends, which is why it is off by default
                jax.debug.callback(progress_cb, ordered=False)
            return None, logits

        return jax.lax.scan(step, None, starts)[1]

    if mesh is not None and mesh.devices.size > 1:
        # window fan-out across the mesh: each device scans its shard of
        # the window grid (embarrassingly parallel); the overlap-add below
        # consumes the gathered result (XLA inserts the all-gather).
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        axis = mesh.axis_names[0]
        n_dev = mesh.shape[axis]
        ng = starts.shape[0]
        pad_g = (n_dev - ng % n_dev) % n_dev
        if pad_g:
            starts = jnp.concatenate(
                [starts, jnp.repeat(starts[-1:], pad_g, 0)], 0)

        def per_dev(x, mods, starts_local, imp):
            return scan_windows(x, mods, starts_local, imp)

        if modalities is None:
            outs = shard_map(lambda x, s, i: per_dev(x, None, s, i),
                             mesh=mesh, in_specs=(P(), P(axis), P()),
                             out_specs=P(axis))(x, starts, imp)
        else:
            outs = shard_map(per_dev, mesh=mesh,
                             in_specs=(P(), P(), P(axis), P()),
                             out_specs=P(axis))(x, modalities, starts, imp)
    else:
        outs = scan_windows(x, modalities, starts, imp)
    # [Ng, k, B, *roi, O] → window-grid [B, *grid, *roi, O]
    outs = outs.reshape(-1, b, *roi, out_channels)[:int(np.prod(grid))]
    outs = jnp.moveaxis(outs, 1, 0).reshape(b, *grid, *roi, out_channels)

    ratios, cell_roi, acc_shape = _cell_geometry(grid, roi, interval)
    if cell_roi != tuple(roi):  # zero-pad windows to whole cells
        wpads = ([(0, 0)] * (1 + nd)
                 + [(0, c - r) for c, r in zip(cell_roi, roi)] + [(0, 0)])
        outs = jnp.pad(outs, wpads)
    acc = jnp.zeros((b, *acc_shape, out_channels), jnp.float32)
    for offsets in itertools.product(*[range(rt) for rt in ratios]):
        # window-local cell (dz,dy,dx) lands at cell index (g + offset)
        sub = outs
        for ax, (off, s) in enumerate(zip(offsets, interval)):
            roi_ax = 1 + nd + ax  # axis of the roi dim within outs
            sub = jax.lax.slice_in_dim(sub, off * s, (off + 1) * s, axis=roi_ax)
        # sub: [B, *grid, *step, O] → dense [B, *(grid*step), O]
        perm = [0]
        for ax in range(nd):
            perm += [1 + ax, 1 + nd + ax]
        sub = sub.transpose(*perm, 1 + 2 * nd)
        sub = sub.reshape(b, *[g * s for g, s in zip(grid, interval)],
                          out_channels)
        pads = [(0, 0)]
        for ax in range(nd):
            lo = offsets[ax] * interval[ax]
            hi = acc.shape[1 + ax] - lo - sub.shape[1 + ax]
            pads.append((lo, hi))
        pads.append((0, 0))
        acc = acc + jnp.pad(sub, pads)
    return acc / count


class SlidingWindowInferer:
    """Callable inferer with per-shape jit caching.

    Args mirror the MONAI call surface: roi_size, sw_batch_size, overlap,
    mode ("constant" | "gaussian"), sigma_scale, stitch_on_host
    (the reference's `infer_cpu`).
    `predict_fn(windows, modalities) -> logits` must be shape-preserving
    over the ROI and is typically `lambda w, m: model.apply(vars, w, m)`.
    """

    def __init__(self, predict_fn: Callable, roi_size: Sequence[int],
                 sw_batch_size: int = 1, overlap: float = 0.5,
                 mode: str = "constant", sigma_scale: float = 0.125,
                 out_channels: int | None = None,
                 stitch_on_host: bool = False, progress: bool = False,
                 mesh=None, batch_windows: bool = False):
        # batch_windows=False runs sw_batch_size groups as a serial in-jit
        # map — identical outputs; true batching is 2.2x slower/window on
        # TPU (XLA norm-stats fusion failure at batch>=2, BASELINE.md)
        # mesh: optional jax.sharding.Mesh — windows fan out across its
        # first axis (each device scans its shard of the window grid), an
        # inference-scaling capability with no reference analog.
        self.mesh = mesh
        self.batch_windows = bool(batch_windows)
        # `progress` (reference predict_whs.py:78): tqdm on the host-stitch
        # path; on the fully-jitted device path an unordered
        # `jax.debug.callback` ticks once per window group (not exported
        # into AOT bundles, disabled under mesh fan-out). Off by default —
        # each tick is a host round-trip on remote backends.
        self.progress = progress
        self._progress_done = 0
        self._progress_total = 0
        self.predict_fn = predict_fn
        self.roi_size = tuple(roi_size)
        self.sw_batch_size = int(sw_batch_size)
        self.overlap = float(overlap)
        self.mode = mode
        self.sigma_scale = float(sigma_scale)
        self.out_channels = out_channels
        self.stitch_on_host = stitch_on_host
        self._jitted: dict[Any, Callable] = {}

    def _importance(self) -> np.ndarray:
        if self.mode == "constant":
            return np.ones(self.roi_size, np.float32)
        if self.mode == "gaussian":
            return gaussian_importance(self.roi_size, self.sigma_scale)
        raise ValueError(f"unknown blend mode {self.mode!r}")

    def _grouped_starts(self, padded: tuple[int, ...]) -> np.ndarray:
        interval = scan_interval(self.roi_size, self.overlap)
        starts = dense_patch_starts(padded, self.roi_size, interval)
        k = self.sw_batch_size
        n = starts.shape[0]
        n_pad = (k - n % k) % k
        if n_pad:
            starts = np.concatenate([starts, np.repeat(starts[-1:], n_pad, 0)], 0)
        return starts.reshape(-1, k, starts.shape[1])

    def _bind(self, p):
        if p is None:
            return self.predict_fn
        return lambda w, m: self.predict_fn(p, w, m)

    def _progress_tick(self):
        """Host-side tick fired by the in-jit `jax.debug.callback` once per
        window group (async, unordered — counts may arrive out of order but
        the total is exact once the program finishes)."""
        import sys
        self._progress_done += 1
        sys.stderr.write(
            f"\r[sliding-window] {self._progress_done}/{self._progress_total}"
            + ("\n" if self._progress_done >= self._progress_total else ""))
        sys.stderr.flush()

    def program(self, spatial: Sequence[int], _progress_cb=None):
        """Build the jittable volume program for a `spatial` (pre-pad) shape.

        Returns `(full, starts, imp, count)` where
        `full(params, inputs, modalities, starts, imp, count)` is the whole
        pad → tile → predict → blend → crop computation and starts/imp/count
        are host numpy arrays meant to travel as device ARGUMENTS (baking
        multi-MB blend tables as HLO constants is a measured compile
        pathology — see module docstring).  Used by `__call__` (per-shape
        jit cache) and by `serve.export_bundle` (volume-level AOT export,
        which serializes `jax.jit(full)` + the aux arrays)."""
        roi = self.roi_size
        spatial = tuple(int(s) for s in spatial)
        interval = scan_interval(roi, self.overlap)
        padded = _pad_to_grid(spatial, roi, interval)
        # symmetric pad (MONAI pads half/half when dim < roi)
        pads = ((0, 0),) + tuple(((p - s) // 2, p - s - (p - s) // 2)
                                 for s, p in zip(spatial, padded)) + ((0, 0),)
        out_ch = self.out_channels
        if out_ch is None:
            raise ValueError("out_channels must be set on SlidingWindowInferer")
        starts = np.asarray(self._grouped_starts(padded), np.int32)
        imp = self._importance()
        # exact: _pad_to_grid guarantees (p - r) % s == 0
        grid = tuple((p - r) // s + 1
                     for p, r, s in zip(padded, roi, interval))
        count = self._overlap_count(grid, roi, interval)

        def full(p, inp, mods, starts, imp, count):
            predict = self._bind(p)
            x = jnp.pad(inp, pads) if any(q != (0, 0) for q in pads) else inp
            out = _sw_core_overlap_add(predict, x, mods, starts, imp,
                                       count, grid=grid, roi=roi,
                                       interval=interval,
                                       out_channels=out_ch,
                                       mesh=self.mesh,
                                       batch_windows=self.batch_windows,
                                       progress_cb=_progress_cb)
            crop = tuple(slice(q[0], q[0] + s)
                         for q, s in zip(pads[1:-1], spatial))
            return out[(slice(None), *crop, slice(None))]

        return full, starts, imp, count

    def __call__(self, inputs: Array, modalities: Array | None = None,
                 params=None) -> Array:
        """Run inference.  If the inferer was built with a 3-argument
        `predict_fn(params, windows, modalities)`, pass `params` here — it
        flows through the jit as an ARGUMENT (no weight constants baked
        into the program; one compile serves every checkpoint/epoch)."""
        roi = self.roi_size
        spatial = tuple(inputs.shape[1:-1])
        interval = scan_interval(roi, self.overlap)
        padded = _pad_to_grid(spatial, roi, interval)
        out_ch = self.out_channels
        if out_ch is None:
            raise ValueError("out_channels must be set on SlidingWindowInferer")

        if self.stitch_on_host:
            pads = ((0, 0),) + tuple(((p - s) // 2, p - s - (p - s) // 2)
                                     for s, p in zip(spatial, padded)) + ((0, 0),)
            x = jnp.pad(inputs, pads) if any(p != (0, 0) for p in pads) else inputs
            starts = self._grouped_starts(padded)
            out = self._host_stitch(self._bind(params), x, modalities,
                                    starts, out_ch)
            crop = tuple(slice(p[0], p[0] + s)
                         for p, s in zip(pads[1:-1], spatial))
            return out[(slice(None), *crop, slice(None))]

        # One fully-jitted program per shape: pad → tile → predict → blend →
        # crop.  Everything per-call is inside the jit (eager ops would cost
        # a dispatch round trip each on remote backends), and the big blend
        # arrays are cached device ARGUMENTS, not baked HLO constants.
        want_progress = (self.progress
                         and (self.mesh is None or self.mesh.devices.size == 1))
        key = (spatial, padded, inputs.shape[0], inputs.shape[-1],
               self.sw_batch_size, want_progress)
        if key not in self._jitted:
            cb = self._progress_tick if want_progress else None
            full, starts, imp, count = self.program(spatial, _progress_cb=cb)
            self._jitted[key] = (jax.jit(full), jnp.asarray(starts),
                                 jnp.asarray(imp), jnp.asarray(count))
        fn, starts, imp, count = self._jitted[key]
        if want_progress:
            self._progress_done = 0
            self._progress_total = int(starts.shape[0])
        return fn(params, inputs, modalities, starts, imp, count)

    def _overlap_count(self, grid, roi, interval) -> np.ndarray:
        """Host-precomputed blend normalizer, shaped like the cell-padded
        accumulator (`[1, *(grid+ratio-1)*step, 1]`); the never-cropped
        region beyond the true padded volume is set to 1 to avoid 0/0."""
        imp = self._importance()
        _, _, acc_shape = _cell_geometry(grid, roi, interval)
        cnt = np.zeros(acc_shape, np.float64)
        for corner in itertools.product(*[range(g) for g in grid]):
            sl = tuple(slice(c * s, c * s + r)
                       for c, r, s in zip(corner, roi, interval))
            cnt[sl] += imp
        cnt[cnt == 0] = 1.0
        return cnt.reshape(1, *acc_shape, 1).astype(np.float32)

    def _host_stitch(self, predict_fn, x, modalities, starts, out_ch):
        """Device predict per window batch, accumulate in host numpy."""
        b = x.shape[0]
        roi = self.roi_size
        imp = self._importance()
        imp_b = imp.reshape(1, *roi, 1)
        acc = np.zeros((b, *x.shape[1:-1], out_ch), np.float32)
        cnt = np.zeros((1, *x.shape[1:-1], 1), np.float32)
        x_np = x  # keep on device; slice via lax for transfer efficiency
        if self.progress:
            try:
                from tqdm import tqdm
                starts = tqdm(starts)
            except ImportError:
                pass
        for group in starts:
            windows = jnp.stack([
                jax.lax.dynamic_slice(x_np, (0, *map(int, s), 0), (b, *roi, x.shape[-1]))
                for s in group]).reshape(-1, *roi, x.shape[-1])
            mods = (jnp.tile(modalities, len(group)) if modalities is not None
                    else None)
            logits = np.asarray(predict_fn(windows, mods), np.float32)
            logits = logits.reshape(len(group), b, *roi, out_ch)
            for i, s in enumerate(group):
                sl = (slice(None), *[slice(int(si), int(si) + r)
                                     for si, r in zip(s, roi)], slice(None))
                acc[sl] += logits[i] * imp_b
                cnt[(slice(0, 1),) + sl[1:-1] + (slice(None),)] += imp_b
        return jnp.asarray(acc / cnt)
