"""Batched chip inference: jitted forward + threaded GeoTIFF writes.

Replaces the reference's torch inference loop (``instageo/model/
infer_utils.py``): batches stream through a double-buffered host→device
queue into one jitted forward (argmax int8 for segmentation, float32 squeeze
for regression), predictions are written concurrently with the source chip's
profile, count=1 and the ``chip``→``prediction`` name swap
(infer_utils.py:37-54).
"""

from __future__ import annotations

import logging
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from instageo_tpu.data.geotiff import Affine, GeoTiffReader, write_geotiff

log = logging.getLogger(__name__)


def save_prediction(
    prediction: np.ndarray,
    source_chip_path: str,
    out_dir: str,
    is_reg_task: bool = False,
) -> str:
    """Write one prediction GeoTIFF next to its source chip's georeferencing.

    Name swap + single-band profile per reference infer_utils.py:37-54.
    """
    with GeoTiffReader(source_chip_path) as src:
        transform = src.transform
        crs = src.crs
        src_hw = (src.height, src.width)
    name = os.path.basename(source_chip_path).replace("chip", "prediction")
    out_path = os.path.join(out_dir, name)
    arr = prediction.astype(np.float32 if is_reg_task else np.int8)
    if arr.shape != src_hw and transform is not None:
        # The model predicted a CENTER CROP of the chip (img_size <
        # chip_size — preprocess center-crops); anchor the raster at the
        # crop's origin, not the chip's, or every prediction lands
        # shifted by the crop margin. (An ungeoreferenced source chip —
        # transform None — is written ungeoreferenced, like the
        # equal-size path.)
        row_off = (src_hw[0] - arr.shape[0]) // 2
        col_off = (src_hw[1] - arr.shape[1]) // 2
        x0, y0 = transform * (col_off, row_off)
        transform = Affine(transform.a, transform.b, x0,
                           transform.d, transform.e, y0)
    write_geotiff(out_path, arr[None], transform=transform, crs=crs)
    return out_path


def make_predict_fn(model: Any, variables: Dict, is_reg_task: bool = False,
                    probabilities: bool = False):
    """Build the jitted inference function over replicated variables.

    ``variables`` are ARGUMENTS of the jitted program, not closure
    captures — closed-over arrays become jaxpr constants, bloating the
    executable by the parameter size and overflowing remote-compile
    request bodies (HTTP 413 on the axon relay; same round-5 fix as
    ops/preprocess.py make_fused_predict_fn)."""

    @jax.jit
    def _predict(variables, x):
        # channels_last skips the NCHW output transpose (serving fast
        # path, see models/seg.py); class dim is axis=-1 here.
        logits = model.apply(variables, x, train=False, channels_last=True)
        if is_reg_task:
            return logits[..., 0].astype(jnp.float32)
        if probabilities:
            # Full per-class softmax (..., C) — a [..., 1] slice would
            # bake in a binary-task assumption (13-class crop model in
            # the registry).
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.argmax(logits, axis=-1).astype(jnp.int8)

    def predict(x):
        return _predict(variables, x)

    predict._jitted = _predict
    predict._variables = variables
    return predict


def chip_inference_from_paths(
    chip_paths: "list[str]",
    out_dir: str,
    model: Any,
    variables: Dict,
    mean,
    std,
    *,
    temporal_size: int = 1,
    bands=None,
    constant_multiplier: float = 1.0,
    is_reg_task: bool = False,
    batch_size: int = 64,
    num_write_threads: int = 4,
    img_size: Optional[int] = None,
) -> Tuple[int, float]:
    """Fully-fused inference: raw chips -> device -> predictions.

    The fast path of the serving loop: chips are decoded in batches by the
    native C++ thread pool (Python codec fallback), transferred raw
    (uint16 — half the PCIe bytes of the reference's host-normalized f32),
    and one jitted program does preprocess + forward + argmax
    (ops/preprocess.py). Decode of batch N+1 overlaps device compute of
    batch N; writes overlap both.
    """
    import numpy as _np

    from instageo_tpu.data.geotiff import GeoTiffReader
    from instageo_tpu.ops.preprocess import make_fused_predict_fn

    if not chip_paths:
        return 0, 0.0
    os.makedirs(out_dir, exist_ok=True)
    with GeoTiffReader(chip_paths[0]) as r:
        shape = (r.count, r.height, r.width)
        dtype = _np.dtype(r.dtypes[0])

    def decode_batch(paths):
        try:
            from instageo_tpu import native

            if native.available():
                return native.read_batch_native(paths, shape, dtype)
        except Exception:
            pass
        out = _np.empty((len(paths),) + shape, dtype)
        for i, p in enumerate(paths):
            with GeoTiffReader(p) as rr:
                out[i] = rr.read()
        return out

    predict = make_fused_predict_fn(
        model, variables, mean, std, temporal_size=temporal_size,
        bands=bands, constant_multiplier=constant_multiplier,
        is_reg_task=is_reg_task, img_size=img_size)

    n = 0
    t0 = time.time()
    pending = None
    next_raw = decode_batch(chip_paths[:batch_size])
    # Decode gets its OWN single-thread executor: sharing the write pool
    # would queue the next batch's decode behind up to batch_size TIFF
    # writes, serializing decode after write and idling the device.
    with ThreadPoolExecutor(num_write_threads) as pool, \
            ThreadPoolExecutor(1) as decode_pool:
        futures = []

        def flush(preds_dev, files):
            preds = np.asarray(jax.device_get(preds_dev))
            for p, f in zip(preds, files):
                futures.append(
                    pool.submit(save_prediction, p, f, out_dir, is_reg_task))

        for i in range(0, len(chip_paths), batch_size):
            files = chip_paths[i : i + batch_size]
            raw = next_raw
            # prefetch the next batch decode while the device runs
            nxt = chip_paths[i + batch_size : i + 2 * batch_size]
            decode_fut = decode_pool.submit(decode_batch, nxt) if nxt else None
            # pad the tail to keep a single compiled shape
            if raw.shape[0] < batch_size:
                pad = _np.zeros((batch_size - raw.shape[0],) + shape, dtype)
                raw = _np.concatenate([raw, pad])
            preds_dev = predict(jnp.asarray(raw))[: len(files)]
            if pending is not None:
                flush(*pending)
            pending = (preds_dev, files)
            n += len(files)
            next_raw = decode_fut.result() if decode_fut else None
        if pending is not None:
            flush(*pending)
        for f in futures:
            f.result()
    dt = time.time() - t0
    log.info("fused chip_inference: %d chips in %.2fs (%.1f chips/s)", n, dt,
             n / dt if dt else 0.0)
    return n, dt


def chip_inference(
    dataloader: Iterable,
    out_dir: str,
    model: Any,
    variables: Dict,
    is_reg_task: bool = False,
    num_write_threads: int = 4,
) -> Tuple[int, float]:
    """Run inference over an ``infer_collate`` loader and write predictions.

    Returns (num_chips, seconds). Device compute overlaps with the next
    batch's host decode (loader prefetch) and with TIFF writes (thread pool,
    reference uses ThreadPoolExecutor(4) too — infer_utils.py:91-128).
    """
    os.makedirs(out_dir, exist_ok=True)
    predict = None
    n = 0
    t0 = time.time()
    pending = None  # (device_preds, filenames): overlap transfer with next step
    with ThreadPoolExecutor(num_write_threads) as pool:
        futures = []

        def flush(preds_dev, files):
            preds = np.asarray(jax.device_get(preds_dev))
            for p, f in zip(preds, files):
                futures.append(
                    pool.submit(save_prediction, p, f, out_dir, is_reg_task))

        full_batch = None
        for batch in dataloader:
            # The third element is the per-chip nodata mask from
            # infer_collate; the reference's loop discards it too
            # (infer_utils.py:92 `for (data, _), file_names`) — predictions
            # cover every pixel, matching reference outputs bit-for-bit.
            x, files, _ = batch
            if predict is None:
                predict = make_predict_fn(model, variables, is_reg_task)
                full_batch = len(files)
            x = np.asarray(x)
            if x.shape[0] < full_batch:
                # Pad the tail batch to the compiled shape: a new shape
                # retraces, and the remote-compile service can queue for
                # minutes — the fused path above pads for the same reason.
                pad = np.zeros((full_batch - x.shape[0],) + x.shape[1:],
                               x.dtype)
                x = np.concatenate([x, pad])
            preds_dev = predict(jnp.asarray(x))[: len(files)]
            if pending is not None:
                flush(*pending)
            pending = (preds_dev, files)
            n += len(files)
        if pending is not None:
            flush(*pending)
        for f in futures:
            f.result()
    dt = time.time() - t0
    log.info("chip_inference: %d chips in %.2fs (%.1f chips/s)", n, dt,
             n / dt if dt else 0.0)
    return n, dt
