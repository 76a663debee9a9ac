"""Sliding-window restoration of full Sentinel-2 scenes.

New capability beyond the reference (BASELINE.json configs[4]; the
reference only handles 64x64 tiles). A full scene (e.g. 10980x10980x13)
is processed as overlapping windows: each native-resolution window is
preprocessed on device exactly like a training tile (scale -> bilinear
upsample to the model size -> model range), denoised, mapped back to the
window's native resolution, and blended into the output with a separable
cosine (Hann-edge) weight so seams vanish.

TPU-first: every device step has a static shape — windows are padded to a
full batch; extraction/assembly are cheap host-side numpy slices while the
device pipeline (preprocess + forward + postprocess, one jit) overlaps
with host assembly of the next batch via async dispatch.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


def _blend_weights(window: int, overlap: int) -> np.ndarray:
    """[window, window] separable blending weight: 1 in the interior,
    raised-cosine ramp over the overlap margin. Strictly positive so the
    accumulated weight never divides by zero."""
    w = np.ones(window, np.float32)
    ramp_len = max(1, overlap)
    ramp = 0.5 - 0.5 * np.cos(np.pi * (np.arange(ramp_len) + 0.5) / ramp_len)
    w[:ramp_len] = ramp
    w[-ramp_len:] = ramp[::-1]
    return np.outer(w, w).astype(np.float32)


def _window_origins(size: int, window: int, stride: int) -> list:
    """Start offsets covering [0, size) with a final flush-right window."""
    if size <= window:
        return [0]
    starts = list(range(0, size - window + 1, stride))
    if starts[-1] != size - window:
        starts.append(size - window)
    return starts


def _make_scene_forward(model, variables, window: int, model_size: int,
                        optimize: bool | str, tta: int = 1):
    """Select the per-batch forward (hybrid folded-BN graph when the model
    supports it, else `model.apply`) and return ``(variables, raw_step)``
    with ``raw_step(variables, batch)`` UNJITTED — callers jit it with
    variables as an argument (closing over them would bake ~190 MB of
    weights into the program as constants; remote-compile transports
    reject the oversized request outright, HTTP 413)."""
    from msid_tpu.ops.preprocess import preprocess_tiles

    forward = None
    if optimize is True or optimize == "auto":
        from msid_tpu.deployment.fastpath import (
            make_hybrid_inference_fn,
            optimize_for_hybrid,
        )

        try:
            variables = optimize_for_hybrid(model, variables, dtype=model.dtype)
            forward = make_hybrid_inference_fn(model)
        except ValueError:
            if optimize is True:
                raise
    if forward is None:
        def forward(variables, x):
            return model.apply(variables, x, train=False)

    if tta > 1:
        from msid_tpu.ops.tta import wrap_forward

        forward = wrap_forward(forward, tta, model_size, model_size)

    def raw_step(variables, batch):
        clean_in = preprocess_tiles(batch, model_size)
        out = forward(variables, clean_in).astype(jnp.float32)
        if model_size != window:
            b, _, _, c = out.shape
            out = jax.image.resize(
                out, (b, window, window, c), method="bilinear", antialias=False
            )
        return out

    return variables, raw_step


def make_scene_step(model, variables, window: int, model_size: int,
                    optimize: bool | str = "auto", tta: int = 1):
    """Jitted per-batch pipeline: raw windows -> preprocess -> denoise ->
    back to native window resolution, in model range.

    ``variables`` is passed as a jit *argument* (bound here with partial),
    never closed over — see :func:`_make_scene_forward`.

    ``optimize="auto"`` uses the hybrid inference graph (flax encoder +
    folded-BN decoder — deployment.fastpath, 58.2 vs 61.8 ms per batch of
    128 on v5e) when the model config supports it; scenes always run at
    throughput batch sizes, so the small-batch fastpath never applies.

    ``tta`` > 1 self-ensembles each window over that many dihedral views
    (`msid_tpu.ops.tta`) — ~``tta`` x the per-window FLOPs."""
    import functools

    variables, raw_step = _make_scene_forward(
        model, variables, window, model_size, optimize, tta=tta
    )
    fn = functools.partial(jax.jit(raw_step), variables)
    fn.assembly = "host"  # checked by restore_scene against device_assembly
    return fn


def make_device_scene_step(model, variables, window: int, model_size: int,
                           overlap: int, optimize: bool | str = "auto",
                           tta: int = 1):
    """Device-resident per-batch pipeline for :func:`restore_scene` with
    ``device_assembly=True``: gather a batch of windows out of the
    device-resident scene, denoise, and blend-accumulate into device
    output buffers — no per-batch host↔device tile traffic (which on
    relayed transports dominates the assembly-on-host path).

    Signature of the returned jit:
        (scene, out_sum, w_sum, origins[B,2] i32, valid[B] f32)
          -> (out_sum, w_sum)
    Overlapping windows within a batch are accumulated with a sequential
    `lax.scan` of dynamic_update_slices (a parallel scatter-add would race
    on the overlap margins). Padded slots carry ``valid=0`` weights.
    """
    import functools

    variables, raw_step = _make_scene_forward(
        model, variables, window, model_size, optimize, tta=tta
    )
    wts = jnp.asarray(_blend_weights(window, overlap))[:, :, None]

    # Donate the accumulators: without donation every batch step allocates
    # fresh full-scene outputs and copies both accumulators (2x HBM and
    # ~13 GB of traffic per step at real 10980² scene scale); with it the
    # scan's dynamic_update_slices alias in place.
    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def step(variables, scene, out_sum, w_sum, origins, valid):
        def gather(origin):
            return jax.lax.dynamic_slice(
                scene, (origin[0], origin[1], 0),
                (window, window, scene.shape[2]),
            )

        batch = jax.vmap(gather)(origins)           # [B, win, win, C]
        tiles = raw_step(variables, batch)          # [B, win, win, C]

        def accum(carry, item):
            out_sum, w_sum = carry
            tile, origin, v = item
            y, x = origin[0], origin[1]
            cur = jax.lax.dynamic_slice(
                out_sum, (y, x, 0), (window, window, out_sum.shape[2])
            )
            out_sum = jax.lax.dynamic_update_slice(
                out_sum, cur + tile * wts * v, (y, x, 0)
            )
            curw = jax.lax.dynamic_slice(w_sum, (y, x, 0), (window, window, 1))
            w_sum = jax.lax.dynamic_update_slice(w_sum, curw + wts * v, (y, x, 0))
            return (out_sum, w_sum), None

        (out_sum, w_sum), _ = jax.lax.scan(
            accum, (out_sum, w_sum),
            (tiles, origins, valid[:, None, None, None]),
        )
        return out_sum, w_sum

    fn = functools.partial(step, variables)
    fn.assembly = "device"  # checked by restore_scene against device_assembly
    return fn


def _band_plan(ys: list, window: int, stride: int, band_origin_rows: int):
    """Group canonical row origins into bands of ``band_origin_rows``
    consecutive origin rows. Returns (groups, band_height) where each
    group is (y_start, [origins...]) and ``band_height`` is the static
    per-band array height ``band_origin_rows*stride + window`` (covers the
    worst-case span of any group plus the carry margin)."""
    g = max(1, band_origin_rows)
    groups = []
    for i in range(0, len(ys), g):
        sub = ys[i : i + g]
        groups.append((sub[0], sub))
    return groups, g * stride + window


@functools.partial(jax.jit, donate_argnums=(0, 1), static_argnums=(4,))
def _carry_into(next_out, next_w, prev_out, prev_w, carry_rows, offset):
    """Add the seam tail of the previous band's accumulators (rows
    [offset, offset+carry_rows) there = rows [0, carry_rows) here).

    Module-level so repeated scene restores hit the jit cache (a fresh
    closure per call would recompile ~1-6 s each through the relay)."""
    _, w, c = prev_out.shape
    tail_o = jax.lax.dynamic_slice(
        prev_out, (offset, 0, 0), (carry_rows, w, c))
    tail_w = jax.lax.dynamic_slice(
        prev_w, (offset, 0, 0), (carry_rows, w, 1))
    next_out = jax.lax.dynamic_update_slice(
        next_out, next_out[:carry_rows] + tail_o, (0, 0, 0))
    next_w = jax.lax.dynamic_update_slice(
        next_w, next_w[:carry_rows] + tail_w, (0, 0, 0))
    return next_out, next_w


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
def _finalize_band(out_sum, w_sum, out_dtype):
    # Padded rows have zero weight; the guard keeps them finite (they
    # are cropped on host). ``out_dtype`` is a (hashable) np.dtype.
    # Only ``out_sum`` is donated: the [H, W, 1] weight plane can never
    # alias the [H, W, C] output, so donating it only triggered XLA's
    # "donated buffers were not usable" warning (seen in the round-4
    # bench log) without saving anything.
    return (out_sum / jnp.maximum(w_sum, 1e-12)).astype(out_dtype)


def restore_scene_streaming(
    model,
    variables,
    scene: np.ndarray,
    window: int = 64,
    overlap: int = 16,
    model_size: int = 192,
    batch_size: int = 64,
    band_origin_rows: int = 16,
    step: Optional[callable] = None,
    output_dtype=np.float16,
    tta: int = 1,
    progress: Optional[callable] = None,
) -> np.ndarray:
    """Banded, double-buffered :func:`restore_scene` (device assembly) for
    relayed transports: H2D upload, compute, and D2H download all overlap.

    The whole-scene device path uploads the scene once and downloads the
    restored scene once — on the axon relay those two serial transfers
    dominate end-to-end time (CLAUDE.md: 0.234 Mpix/s, compute alone is
    ~5 Mpix/s). This variant streams row BANDS instead:

      * canonical window origins (identical to :func:`restore_scene` — the
        blend geometry does not change) are grouped into bands of
        ``band_origin_rows`` origin rows;
      * an uploader thread ships each band's pixel rows ahead of compute
        (native dtype — uint16 Sentinel-2 DN is 2x fewer relay bytes);
      * the main thread runs the SAME jitted gather/denoise/blend step as
        ``make_device_scene_step`` on band-sized accumulators, carries the
        seam rows (top ``window`` rows of the next band overlap the tail
        of this one) device-to-device, then finalizes the band (divide by
        the blend-weight sum, cast to ``output_dtype``) on device;
      * a downloader thread drains finished bands while later bands
        compute.

    Numerics: same window origins, same blend weights, same forward as the
    whole-scene device path; only the accumulation grouping differs, so
    results match to float-addition reordering (~1e-6 relative), not
    bit-exactly. fp16 output halves the download; pass np.float32 to match
    restore_scene's default dtype.

    Returns fp32/fp16 [H, W, C] in model range (as ``output_dtype``).
    """
    if not 0 <= overlap < window:
        raise ValueError(f"overlap ({overlap}) must be in [0, window={window})")
    import queue as _queue
    import threading

    scene = np.asarray(scene)
    h0, w0 = scene.shape[:2]
    if h0 < window or w0 < window:
        scene = np.pad(
            scene,
            ((0, max(0, window - h0)), (0, max(0, window - w0)), (0, 0)),
            mode="edge",
        )
    h, w, c = scene.shape
    stride = window - overlap
    ys = _window_origins(h, window, stride)
    xs = _window_origins(w, window, stride)
    groups, band_h = _band_plan(ys, window, stride, band_origin_rows)

    if step is None:
        step = make_device_scene_step(model, variables, window, model_size,
                                      overlap, tta=tta)
    elif getattr(step, "assembly", None) not in (None, "device"):
        raise ValueError("streaming restore needs a make_device_scene_step "
                         f"step, got assembly={step.assembly!r}")

    # --- uploader: ship band pixel rows ahead of compute (depth-2 queue
    # keeps at most one band in flight beyond the one computing). The
    # trailing None sentinel doubles as the failure signal: on an
    # uploader error the main loop sees it early and surfaces `errors`.
    upload_q: _queue.Queue = _queue.Queue(maxsize=2)
    errors: list = []
    stop_upload = threading.Event()

    def uploader():
        try:
            for y_start, _sub in groups:
                if stop_upload.is_set():  # main loop bailed — stop shipping
                    return
                rows = scene[y_start : y_start + band_h]
                if rows.shape[0] < band_h:  # last band: flush-bottom padding
                    rows = np.pad(
                        rows, ((0, band_h - rows.shape[0]), (0, 0), (0, 0)))
                upload_q.put(jnp.asarray(rows))
        except Exception as e:  # pragma: no cover - exercised via errors[]
            errors.append(e)
        finally:
            upload_q.put(None)

    # --- downloader: device_get blocks, so drain on a thread. After a
    # failure it keeps DRAINING (discarding) so the producer's bounded
    # put() never deadlocks; the error re-raises after join.
    out_host = np.zeros((h, w, c), dtype=output_dtype)
    download_q: _queue.Queue = _queue.Queue(maxsize=2)

    def downloader():
        while True:
            item = download_q.get()
            if item is None:
                return
            if errors:
                continue
            try:
                dev, y_start, n_rows = item
                out_host[y_start : y_start + n_rows] = np.asarray(
                    jax.device_get(dev))[:n_rows]
            except Exception as e:  # pragma: no cover - surfaced below
                errors.append(e)

    up_t = threading.Thread(target=uploader, daemon=True)
    down_t = threading.Thread(target=downloader, daemon=True)
    up_t.start()
    down_t.start()

    out_sum = jnp.zeros((band_h, w, c), jnp.float32)
    w_sum = jnp.zeros((band_h, w, 1), jnp.float32)
    done_windows = 0
    total_windows = len(ys) * len(xs)
    out_np_dtype = np.dtype(output_dtype)
    try:
        for k, (y_start, sub_ys) in enumerate(groups):
            band = upload_q.get()
            if band is None:  # uploader failed before finishing
                break
            origins = np.asarray(
                [(y - y_start, x) for y in sub_ys for x in xs], np.int32)
            for i in range(0, len(origins), batch_size):
                chunk = origins[i : i + batch_size]
                valid = np.ones(len(chunk), np.float32)
                if len(chunk) < batch_size:
                    pad = batch_size - len(chunk)
                    chunk = np.concatenate(
                        [chunk, np.zeros((pad, 2), np.int32)], axis=0)
                    valid = np.concatenate([valid, np.zeros(pad, np.float32)])
                out_sum, w_sum = step(band, out_sum, w_sum,
                                      jnp.asarray(chunk), jnp.asarray(valid))
                done_windows += int(valid.sum())
                if progress:
                    progress(done_windows, total_windows)
            if k + 1 < len(groups):
                next_start = groups[k + 1][0]
                offset = next_start - y_start
                next_out = jnp.zeros((band_h, w, c), jnp.float32)
                next_w = jnp.zeros((band_h, w, 1), jnp.float32)
                next_out, next_w = _carry_into(
                    next_out, next_w, out_sum, w_sum, window,
                    jnp.int32(offset))
                n_final = next_start - y_start  # rows owned solely by band k
            else:
                n_final = min(band_h, h - y_start)
            download_q.put(
                (_finalize_band(out_sum, w_sum, out_np_dtype), y_start,
                 n_final))
            if k + 1 < len(groups):
                out_sum, w_sum = next_out, next_w
    finally:
        # Always unblock the downloader, then the uploader: on an early
        # exit the uploader may be parked on its bounded put(), so signal
        # it to stop producing and drain the queue until its sentinel (or
        # the thread exits) before joining — otherwise a failed call leaks
        # the thread plus up to queue-depth band-sized device buffers.
        download_q.put(None)
        down_t.join()
        stop_upload.set()
        while up_t.is_alive():
            try:
                if upload_q.get(timeout=0.2) is None:
                    break
            except _queue.Empty:
                continue
        up_t.join()
    if errors:
        raise errors[0]
    return out_host[:h0, :w0]


def restore_scene(
    model,
    variables,
    scene: np.ndarray,
    window: int = 64,
    overlap: int = 16,
    model_size: int = 192,
    batch_size: int = 64,
    progress: Optional[callable] = None,
    step: Optional[callable] = None,
    device_assembly: bool = False,
    output_dtype=np.float32,
    tta: int = 1,
) -> np.ndarray:
    """Denoise a full [H, W, C] scene; returns fp32 [H, W, C] in model range
    (use `msid_tpu.ops.preprocess.from_model_range` for reflectance).

    Args:
        scene: raw scene, any real dtype (same heuristic scaling as tiles).
        window: native-resolution window size (reference tiles are 64).
        overlap: pixels of overlap between adjacent windows.
        model_size: the model's input resolution (window is upsampled to it).
        batch_size: windows per device step (static shape; last batch pads).
        step: reuse a `make_scene_step` / `make_device_scene_step` result
            across calls (skips the per-call jit compile when restoring
            many scenes).
        device_assembly: keep the whole pipeline device-resident — upload
            the scene once, gather/denoise/blend on device, download the
            restored scene once. Removes the per-batch host↔device tile
            traffic (the bottleneck on relayed transports) at the cost of
            scene + two accumulators in HBM (fp32: ~3x the scene size).
            The upload keeps the scene's native dtype (uint16 Sentinel-2
            DN ships 2x fewer bytes than fp32; the uint16→fp32 cast on
            device is exact, so results are bit-identical).
        output_dtype: dtype of the returned scene. The residual cost of
            the device path is the once-per-scene relay transfers;
            ``np.float16`` halves the download at ~3 decimal digits of
            precision (model range ≈[-2,2] — well above the 41.5 dB
            quality bar, but not bit-identical to fp32). The cast runs
            on device so the relay carries the narrow dtype.
        tta: self-ensemble each window over this many dihedral views
            (`msid_tpu.ops.tta`; 1 disables). Ignored when a prebuilt
            ``step`` is supplied — bake it into the step instead.
    """
    if not 0 <= overlap < window:
        raise ValueError(f"overlap ({overlap}) must be in [0, window={window})")
    if step is not None:
        expected = "device" if device_assembly else "host"
        tag = getattr(step, "assembly", None)
        if tag is not None and tag != expected:
            raise ValueError(
                f"step was built for {tag} assembly but "
                f"device_assembly={device_assembly} — build it with "
                + ("make_device_scene_step" if device_assembly
                   else "make_scene_step")
            )
    scene = np.asarray(scene)
    h0, w0 = scene.shape[:2]
    if h0 < window or w0 < window:
        # Edge-pad undersized scenes up to one window (processing the
        # padded scene, cropping after): every window-sized device shape
        # stays static, and the blend weights stay valid.
        scene = np.pad(
            scene,
            ((0, max(0, window - h0)), (0, max(0, window - w0)), (0, 0)),
            mode="edge",
        )
    h, w, c = scene.shape
    stride = window - overlap
    ys = _window_origins(h, window, stride)
    xs = _window_origins(w, window, stride)
    origins = [(y, x) for y in ys for x in xs]

    if device_assembly:
        if step is None:
            step = make_device_scene_step(model, variables, window,
                                          model_size, overlap, tta=tta)
        # Native-dtype upload: integer scenes (uint16 Sentinel-2 DN) ship
        # 2x fewer bytes through the relay than fp32; the device pipeline
        # casts exactly in normalize_raw.
        dev_scene = jnp.asarray(scene)
        out_sum_d = jnp.zeros((h, w, c), jnp.float32)
        w_sum_d = jnp.zeros((h, w, 1), jnp.float32)
        all_origins = np.asarray(origins, np.int32)
        for i in range(0, len(origins), batch_size):
            chunk = all_origins[i : i + batch_size]
            valid = np.ones(len(chunk), np.float32)
            if len(chunk) < batch_size:
                pad = batch_size - len(chunk)
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, 2), np.int32)], axis=0
                )
                valid = np.concatenate([valid, np.zeros(pad, np.float32)])
            out_sum_d, w_sum_d = step(
                dev_scene, out_sum_d, w_sum_d,
                jnp.asarray(chunk), jnp.asarray(valid),
            )
            if progress:
                progress(i, len(origins))
        out = (out_sum_d / w_sum_d).astype(jnp.dtype(output_dtype))
        return np.asarray(out)[:h0, :w0]

    if step is None:
        step = make_scene_step(model, variables, window, model_size, tta=tta)
    weights = _blend_weights(window, overlap)

    out_sum = np.zeros((h, w, c), np.float32)
    w_sum = np.zeros((h, w, 1), np.float32)

    pending = []  # (device_result, batch_origins) — overlap host/device
    for i in range(0, len(origins), batch_size):
        chunk = origins[i : i + batch_size]
        batch = np.stack(
            [scene[y : y + window, x : x + window] for (y, x) in chunk]
        ).astype(np.float32)
        if len(chunk) < batch_size:  # pad to the static batch shape
            pad = np.repeat(batch[:1], batch_size - len(chunk), axis=0)
            batch = np.concatenate([batch, pad], axis=0)
        pending.append((step(jnp.asarray(batch)), chunk))

        # Drain one completed batch behind the in-flight one.
        if len(pending) > 1:
            _drain(pending.pop(0), out_sum, w_sum, weights, window)
            if progress:
                progress(i, len(origins))
    while pending:
        _drain(pending.pop(0), out_sum, w_sum, weights, window)

    return (out_sum / w_sum)[:h0, :w0].astype(output_dtype, copy=False)


def _drain(entry, out_sum, w_sum, weights, window):
    result, chunk = entry
    tiles = np.asarray(jax.device_get(result))[: len(chunk)]
    wt = weights[:, :, None]
    for tile, (y, x) in zip(tiles, chunk):
        out_sum[y : y + window, x : x + window] += tile * wt
        w_sum[y : y + window, x : x + window] += wt
