"""Chip dataset + preprocessing/augmentation pipeline.

Re-implements the reference dataloader (``instageo/model/dataloader.py``)
without torch/PIL/rasterio: chips are decoded with the framework's own
GeoTIFF codec, augmentations run vectorized in numpy/cv2 over the whole
(T·C, H, W) stack (the reference loops per-band PIL images), and batches are
assembled by a threaded prefetching loader that feeds the device queue.

Semantics parity (same config names, same math):
* ``process_data``: band select → constant multiply; label replace/reduce
  (reference :707-750);
* augmentations hflip/vflip/rotate/brightness/blur/noise with the same
  probability/parameter surface and the same clip-normalize-roundtrip
  behavior for blur/noise (reference :80-403);
* ``process_and_augment``: random crop → augs → per-frame normalize →
  ``(C, T, H, W)`` (reference :527-585);
* ``process_test``: sliding-window crops stacked to ``(N, C, T, H, W)``
  (reference :618-669);
* dataset validity QA scan (``get_valid_filepaths`` — reference :784-829).
"""

from __future__ import annotations

import glob
import hashlib
import logging
import math
import os
import queue
import threading
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np
import pandas as pd

from instageo_tpu.data.geotiff import GeoTiffReader

log = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Raster reading / label handling
# ---------------------------------------------------------------------------


def _read_full(fname: str) -> np.ndarray:
    """Full-raster decode: native C++ path when built, Python codec else."""
    try:
        from instageo_tpu import native

        if native.available():
            return native.read_geotiff_native(fname)
    except Exception:  # fall back on any native failure
        pass
    with GeoTiffReader(fname) as src:
        return src.read()


def _read_full_cached(fname: str, cache_dir: str) -> np.ndarray:
    """Decode-once chip cache: raw ``np.save`` of the full decoded raster.

    Training is multi-epoch but the TIFF decode (inflate + predictor +
    plane assembly) re-pays every epoch; a decoded ``.npy`` loads as one
    ``fread`` and skips all of it from epoch 2 onward (PERF.md "Host
    ingestion budget" lever). Keyed by (path-hash, mtime_ns, size) so an
    updated source file invalidates its entry; writes are
    tmp-then-``os.replace`` atomic so concurrent loader threads/processes
    never observe a partial file; stale keys for the same source are
    pruned on write. Band selection/scaling stay OUTSIDE the cache — the
    entry is config-independent.
    """
    try:
        st = os.stat(fname)
    except OSError:
        return _read_full(fname)
    h = hashlib.sha1(os.path.abspath(fname).encode()).hexdigest()[:20]
    key = f"{h}_{st.st_mtime_ns}_{st.st_size}.npy"
    path = os.path.join(cache_dir, key)
    try:
        return np.load(path)
    except Exception:
        pass  # miss, or a corrupt entry -> re-decode (and overwrite)
    data = _read_full(fname)
    tmp = f"{path}.tmp{os.getpid()}_{threading.get_ident()}"
    try:
        os.makedirs(cache_dir, exist_ok=True)
        with open(tmp, "wb") as f:  # handle API: np.save(str) appends .npy
            np.save(f, data)
        os.replace(tmp, path)
        for old in glob.glob(os.path.join(cache_dir, f"{h}_*.npy")):
            base = os.path.basename(old)
            if base == key:
                continue
            # Cross-process prune race (ADVICE r4): a writer holding an
            # older stat view must never glob-delete an entry a peer just
            # wrote for a NEWER version of the same source — compare the
            # embedded mtime_ns and only prune strictly-older keys.
            try:
                if int(base.split("_")[1]) > st.st_mtime_ns:
                    continue
            except (IndexError, ValueError):
                pass  # malformed name: treat as stale
            try:
                os.remove(old)
            except OSError:
                pass
    except OSError as e:  # cache dir read-only/full: degrade to no-cache
        log.warning("chip cache write failed (%s); continuing uncached", e)
        try:
            os.remove(tmp)
        except OSError:
            pass
    return data


def _evict_cached(fname: str, cache_dir: Optional[str]) -> None:
    """Drop every cache entry for ``fname`` (any mtime/size version).

    Used by the QA scan for rows it REMOVES from the dataset (ADVICE r4):
    their decoded chips/labels would otherwise sit on disk forever —
    ``__getitem__`` never reads them and the stale-key prune only fires
    on a re-write of the same source."""
    if not cache_dir:
        return
    h = hashlib.sha1(os.path.abspath(fname).encode()).hexdigest()[:20]
    for old in glob.glob(os.path.join(cache_dir, f"{h}_*.npy")):
        try:
            os.remove(old)
        except OSError:
            pass


def get_raster_data(
    fname: str,
    is_label: bool = True,
    bands: Optional[Sequence[int]] = None,
    cache_dir: Optional[str] = None,
) -> np.ndarray:
    """Read a raster to (bands, H, W); select bands for imagery."""
    data = _read_full_cached(fname, cache_dir) if cache_dir else _read_full(fname)
    if (not is_label) and bands:
        data = data[list(bands), ...]
    return data


def process_data(
    im_fname: str,
    mask_fname: Optional[str] = None,
    no_data_value: Optional[float] = -9999,
    reduce_to_zero: bool = False,
    replace_label: Optional[Tuple] = None,
    bands: Optional[Sequence[int]] = None,
    constant_multiplier: float = 1.0,
    cache_dir: Optional[str] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Load and preprocess an (image, label) pair (reference :707-750)."""
    arr_x = get_raster_data(im_fname, is_label=False, bands=bands, cache_dir=cache_dir)
    if no_data_value is not None and np.issubdtype(arr_x.dtype, np.floating):
        # Reference parity (dataloader.py:697 ``data.fillna(...)``): float
        # rasters (S1 chips) carry NaN for missing pixels — fill with the
        # nodata sentinel before scaling, or NaNs flow into training.
        arr_x = np.nan_to_num(arr_x, nan=no_data_value)
    arr_x = arr_x * constant_multiplier
    arr_y = None
    if mask_fname:
        arr_y = get_raster_data(mask_fname, cache_dir=cache_dir)
        if replace_label:
            arr_y = np.where(arr_y == replace_label[0], replace_label[1], arr_y)
        if reduce_to_zero:
            arr_y = arr_y - 1
    return arr_x, arr_y


def mask_label_with_chip(
    chips_path: str,
    labels_path: str,
    chip_no_data_value: float = 0,
    label_no_data_value: float = -1,
    bands_per_step: int = 6,
    cache_dir: Optional[str] = None,
) -> bool:
    """True if the label has no valid pixel under the chip's data mask.

    Reference :753-781 — reads band ``6·i + 1`` of each timestep and keeps
    label pixels where every timestep has data. With ``cache_dir`` the QA
    scan reads (and populates) the decoded-chip cache instead of partial
    TIFF reads — the full decode is paid once here and ``__getitem__``
    then hits a warm entry.
    """
    if cache_dir:
        full = _read_full_cached(chips_path, cache_dir)
        num_steps = max(1, full.shape[0] // bands_per_step)
        stacked = full[[bands_per_step * i for i in range(num_steps)]]
    else:
        with GeoTiffReader(chips_path) as src:
            num_steps = max(1, src.count // bands_per_step)
            stacked = src.read([bands_per_step * i + 1 for i in range(num_steps)])
    stacked = np.where(stacked == chip_no_data_value, 0, 1).all(0)

    if cache_dir:
        label = _read_full_cached(labels_path, cache_dir)[0].astype(np.float64)
    else:
        with GeoTiffReader(labels_path) as src:
            label = src.read(1).astype(np.float64)
    label = np.where(label == label_no_data_value, np.nan, label)
    label = np.where(stacked == 0, np.nan, label)
    return bool(np.all(np.isnan(label)))


def get_valid_filepaths(
    fname: str,
    input_root: str,
    no_data_value: float = -9999,
    ignore_index: float = -1,
    cache_dir: Optional[str] = None,
) -> List[Tuple[str, Optional[str]]]:
    """QA scan over the chip CSV (``Input``/``Label`` columns).

    Reference :784-829: drops rows whose chip is unreadable or whose label
    has no valid pixels.
    """
    file_paths: List[Tuple[str, Optional[str]]] = []
    data = pd.read_csv(fname)
    label_present = "Label" in data.columns
    for _, row in data.iterrows():
        im_path = os.path.join(input_root, str(row["Input"]))
        mask_path = os.path.join(input_root, str(row["Label"])) if label_present else None
        if not os.path.exists(im_path):
            continue
        try:
            with GeoTiffReader(im_path):
                pass
            if mask_path is not None:
                if not mask_label_with_chip(
                    im_path, mask_path,
                    chip_no_data_value=no_data_value,
                    label_no_data_value=ignore_index,
                    cache_dir=cache_dir,
                ):
                    file_paths.append((im_path, mask_path))
                else:
                    # Dropped row: its just-cached decodes are dead —
                    # evict so the cache holds only rows the dataset
                    # will actually read (ADVICE r4).
                    _evict_cached(im_path, cache_dir)
                    _evict_cached(mask_path, cache_dir)
            else:
                file_paths.append((im_path, None))
        except Exception as e:  # unreadable chip -> drop (reference behavior)
            log.error("%s: %s", im_path, e)
            _evict_cached(im_path, cache_dir)
            continue
    log.info("Dropped a total of %d rows", len(data) - len(file_paths))
    return file_paths


# ---------------------------------------------------------------------------
# Augmentations (vectorized over the (T*C, H, W) stack)
# ---------------------------------------------------------------------------


def _rotate_stack(stack: np.ndarray, angle: float, fill: float,
                  interp=cv2.INTER_NEAREST) -> np.ndarray:
    h, w = stack.shape[-2:]
    m = cv2.getRotationMatrix2D(((w - 1) / 2.0, (h - 1) / 2.0), angle, 1.0)
    out = np.stack([
        cv2.warpAffine(plane, m, (w, h), flags=interp,
                       borderMode=cv2.BORDER_CONSTANT, borderValue=float(fill))
        for plane in stack.astype(np.float32)
    ])
    return out


def random_augs(
    ims: np.ndarray,
    label: Optional[np.ndarray],
    rng: np.random.Generator,
    augmentations: Optional[List[Dict[str, Any]]],
    chip_no_data_value: float = 0,
    label_no_data_value: float = -1,
    max_pixel_value: float = 10000.0,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Apply the configured augs in order (reference :187-243 semantics)."""
    if not augmentations:
        return ims, label
    ims = ims.astype(np.float32)
    for aug in augmentations:
        name = aug["name"]
        p = float(aug.get("p", 0.5))
        if rng.random() >= p:
            continue
        if name == "hflip":
            ims = ims[..., ::-1].copy()
            if label is not None:
                label = label[..., ::-1].copy()
        elif name == "vflip":
            ims = ims[..., ::-1, :].copy()
            if label is not None:
                label = label[..., ::-1, :].copy()
        elif name == "rotate":
            degrees = float(aug.get("degrees", 15))
            angle = rng.uniform(-degrees, degrees)
            ims = _rotate_stack(ims, angle, chip_no_data_value)
            if label is not None:
                label = _rotate_stack(
                    label[None].astype(np.float32), angle, label_no_data_value)[0]
        elif name == "brightness":
            bright = rng.uniform(*aug.get("brightness_range", (0.8, 1.2)))
            contrast = rng.uniform(*aug.get("contrast_range", (0.8, 1.2)))
            ims = ims * bright
            mean = ims.mean(axis=(-2, -1), keepdims=True)  # per band, like PIL loop
            ims = np.clip((ims - mean) * contrast + mean, 0, max_pixel_value)
        elif name == "blur":
            k = int(aug.get("kernel_size", 3))
            sigma = rng.uniform(*aug.get("sigma_range", (0.1, 2.0)))
            arr = np.clip(ims, 0, max_pixel_value) / max_pixel_value
            arr = np.stack([cv2.GaussianBlur(p_, (k, k), sigma) for p_ in arr])
            ims = np.clip(arr, 0.0, 1.0) * max_pixel_value
        elif name == "noise":
            std = float(aug.get("noise_std", 0.05))
            # f32 ziggurat + in-place passes: same N(0, std) distribution
            # and clip-normalize-roundtrip semantics as the f64 form, ~20%
            # faster on the host ingest path (PERF.md "Host ingestion").
            arr = np.clip(ims, 0, max_pixel_value)
            arr *= np.float32(1.0 / max_pixel_value)
            noise = rng.standard_normal(arr.shape, dtype=np.float32)
            noise *= np.float32(std)
            arr += noise
            np.clip(arr, 0.0, 1.0, out=arr)
            arr *= np.float32(max_pixel_value)
            ims = arr
        else:
            raise ValueError(f"Unknown augmentation {name!r}")
    return ims, label


# ---------------------------------------------------------------------------
# Processing to model tensors
# ---------------------------------------------------------------------------


def normalize_and_reshape(
    ims: np.ndarray,
    mean: Sequence[float],
    std: Sequence[float],
    temporal_size: int = 1,
) -> np.ndarray:
    """(T·C, H, W) -> normalized (C, T, H, W) (reference :495-524)."""
    tc, h, w = ims.shape
    c = tc // temporal_size
    ims = ims.reshape(temporal_size, c, h, w).astype(np.float32)
    mean_arr = np.asarray(mean, np.float32)[None, :, None, None]
    std_arr = np.asarray(std, np.float32)[None, :, None, None]
    ims = (ims - mean_arr) / std_arr
    return np.ascontiguousarray(ims.transpose(1, 0, 2, 3))


def random_crop(ims: np.ndarray, label: Optional[np.ndarray], im_size: int,
                rng: np.random.Generator) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    h, w = ims.shape[-2:]
    if h == im_size and w == im_size:
        return ims, label
    top = int(rng.integers(0, h - im_size + 1))
    left = int(rng.integers(0, w - im_size + 1))
    ims = ims[..., top : top + im_size, left : left + im_size]
    if label is not None:
        label = label[..., top : top + im_size, left : left + im_size]
    return ims, label


def process_and_augment(
    x: np.ndarray,
    y: Optional[np.ndarray],
    mean: Sequence[float],
    std: Sequence[float],
    temporal_size: int = 1,
    im_size: int = 224,
    crop: bool = True,
    label_no_data_value: float = -1,
    chip_no_data_value: float = 0,
    max_pixel_value: float = 10000.0,
    augmentations: Optional[List[Dict[str, Any]]] = None,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Full train-time preprocessing (reference :527-585)."""
    rng = rng or np.random.default_rng()
    ims = np.asarray(x)
    label = None if y is None else np.asarray(y, np.float32).squeeze()
    if crop == "center":
        # Deterministic center crop — the inference path (chips larger
        # than im_size must crop the SAME window every run, and the
        # window the prediction writer anchors its georeferencing to).
        h, w = ims.shape[-2:]
        top, left = (h - im_size) // 2, (w - im_size) // 2
        ims = ims[..., top:top + im_size, left:left + im_size]
        if label is not None:
            label = label[..., top:top + im_size, left:left + im_size]
    elif crop:
        ims, label = random_crop(ims, label, im_size, rng)
    ims, label = random_augs(
        ims, label, rng, augmentations,
        chip_no_data_value=chip_no_data_value,
        label_no_data_value=label_no_data_value,
        max_pixel_value=max_pixel_value,
    )
    ims = normalize_and_reshape(ims, mean, std, temporal_size)
    return ims, label


def crop_array(arr: np.ndarray, left: int, top: int, right: int, bottom: int) -> np.ndarray:
    """Crop last two spatial dims of a 2D/3D/4D array (reference :588-615)."""
    if arr.ndim == 2:
        return arr[top:bottom, left:right]
    if arr.ndim in (3, 4):
        return arr[..., top:bottom, left:right]
    raise ValueError("Input array must be 2D, 3D or 4D")


def process_test(
    x: np.ndarray,
    y: np.ndarray,
    mean: Sequence[float],
    std: Sequence[float],
    temporal_size: int = 1,
    img_size: int = 512,
    crop_size: int = 224,
    stride: int = 224,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sliding-window eval crops -> (N, C, T, h, w), (N, h, w) (ref :618-669)."""
    imgs, labels = [], []
    for top in range(0, img_size - crop_size + 1, stride):
        for left in range(0, img_size - crop_size + 1, stride):
            bottom, right = top + crop_size, left + crop_size
            xi = crop_array(x, left, top, right, bottom)
            yi = crop_array(y, left, top, right, bottom)
            xi, yi = process_and_augment(
                xi, yi, mean, std, temporal_size, im_size=crop_size, crop=False,
                augmentations=None,
            )
            imgs.append(xi)
            labels.append(yi)
    return np.stack(imgs), np.stack(labels)


# ---------------------------------------------------------------------------
# Dataset + threaded batch loader
# ---------------------------------------------------------------------------


class InstaGeoDataset:
    """CSV-driven chip dataset with validity QA (reference :832-906)."""

    def __init__(
        self,
        filename: str,
        input_root: str,
        preprocess_func: Callable,
        chip_no_data_value: float,
        label_no_data_value: float,
        replace_label: Optional[Tuple],
        reduce_to_zero: bool,
        constant_multiplier: float,
        bands: Optional[Sequence[int]] = None,
        include_filenames: bool = False,
        cache_dir: Optional[str] = None,
    ) -> None:
        self.input_root = input_root
        self.preprocess_func = preprocess_func
        self.bands = list(bands) if bands else None
        self.cache_dir = cache_dir
        self.file_paths = get_valid_filepaths(
            filename, input_root, chip_no_data_value, label_no_data_value,
            cache_dir=cache_dir)
        self.no_data_value = chip_no_data_value
        self.replace_label = replace_label
        self.reduce_to_zero = reduce_to_zero
        self.constant_multiplier = constant_multiplier
        self.include_filenames = include_filenames

    def __len__(self) -> int:
        return len(self.file_paths)

    def __getitem__(self, i: int):
        im_fname, mask_fname = self.file_paths[i]
        arr_x, arr_y = process_data(
            im_fname, mask_fname,
            no_data_value=self.no_data_value,
            replace_label=self.replace_label,
            reduce_to_zero=self.reduce_to_zero,
            bands=self.bands,
            constant_multiplier=self.constant_multiplier,
            cache_dir=self.cache_dir,
        )
        sample = self.preprocess_func(arr_x, arr_y)
        if self.include_filenames:
            # process_data already applied constant_multiplier, so the
            # no-data sentinel must be compared in the SCALED domain.
            # (The reference compares unscaled — dataloader.py:906 — an
            # all-False mask whenever multiplier != 1; its consumers
            # discard the mask so the bug is latent there. Fixed here.)
            nodata = self.no_data_value * self.constant_multiplier
            return sample, im_fname, arr_x == nodata
        return sample


def default_collate(samples: List[Tuple[np.ndarray, np.ndarray]]):
    xs = np.stack([s[0] for s in samples])
    ys = np.stack([s[1] for s in samples])
    return xs, ys


def eval_collate(samples: List[Tuple[np.ndarray, np.ndarray]]):
    """Concatenate sliding-window crops over the batch dim (ref pu:78-89)."""
    xs = np.concatenate([s[0] for s in samples], axis=0)
    ys = np.concatenate([s[1] for s in samples], axis=0)
    return xs, ys


def infer_collate(samples):
    """Stack + carry filenames and nodata masks (ref pu:92-104)."""
    xs = np.stack([s[0][0] for s in samples])
    files = [s[1] for s in samples]
    masks = np.stack([s[2] for s in samples])
    return xs, files, masks


# -- process-worker plumbing (module-level so spawn children can import it).
# The dataset is pickled ONCE into each worker at pool start (initializer),
# not per batch; workers then look samples up by index.
_WORKER_DS = None


def _pool_init(ds_bytes: bytes) -> None:
    global _WORKER_DS
    import pickle

    _WORKER_DS = pickle.loads(ds_bytes)


def _pool_get(i: int):
    return _WORKER_DS[i]


class DataLoader:
    """Prefetching batch loader (replaces torch DataLoader workers).

    ``worker_mode="thread"`` (default): ``num_workers`` threads decode/augment
    samples concurrently — the GeoTIFF codec and cv2 release the GIL in
    zlib/cv2 kernels, but numpy augment passes hold it, so thread scaling
    flattens past a few workers. ``worker_mode="process"`` spawns real
    processes (torch-DataLoader-style) for linear multi-core scaling of the
    full decode→augment path; the dataset must be picklable (it is: a file
    list + a module-level preprocess partial) and the pool is respawned per
    epoch (~1 s — noise against minutes-long epochs). Batches are staged in
    a bounded queue either way so host IO overlaps device compute.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 1,
        collate_fn: Callable = default_collate,
        seed: int = 0,
        drop_last: bool = False,
        prefetch_depth: int = 2,
        worker_mode: str = "thread",
    ) -> None:
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"worker_mode must be thread|process, got {worker_mode!r}")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.collate_fn = collate_fn
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch_depth = prefetch_depth
        self.worker_mode = worker_mode
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        self._epoch += 1
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, n, self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_depth)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            """Bounded put that keeps checking ``stop``: an abandoned
            iterator (consumer raised/broke mid-epoch) must not leave the
            producer blocked forever on a full queue, pinning the worker
            pool and the queued decoded batches for the process lifetime."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def make_pool():
            if self.worker_mode == "process" and self.num_workers > 1:
                import multiprocessing as mp
                import pickle
                from concurrent.futures import ProcessPoolExecutor

                # spawn (not fork): the parent may hold jax/XLA threads.
                return ProcessPoolExecutor(
                    self.num_workers,
                    mp_context=mp.get_context("spawn"),
                    initializer=_pool_init,
                    initargs=(pickle.dumps(self.dataset),),
                ), _pool_get
            from concurrent.futures import ThreadPoolExecutor

            return ThreadPoolExecutor(self.num_workers), self.dataset.__getitem__

        def produce():
            try:
                pool, getter = make_pool()
                with pool:
                    for idxs in batches:
                        if stop.is_set():
                            return
                        # chunksize: one IPC round trip per worker, not
                        # per ~1 MB sample (ADVICE r4 — default 1 eroded
                        # process-mode scaling at larger batches).
                        samples = list(pool.map(
                            getter, [int(i) for i in idxs],
                            chunksize=max(1, len(idxs) // self.num_workers)))
                        if not put_or_stop(self.collate_fn(samples)):
                            return
            except Exception as e:  # surface worker errors to the consumer
                from concurrent.futures.process import BrokenProcessPool

                if isinstance(e, BrokenProcessPool):
                    e = RuntimeError(
                        "worker_mode=process pool died during startup or a "
                        "batch. If this happened immediately, the usual cause "
                        "is a non-importable __main__ (stdin/REPL script) — "
                        "spawn workers must re-import it; run from a file or "
                        "use worker_mode=thread. Original: " + repr(e))
                put_or_stop(e)
            finally:
                put_or_stop(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def create_dataloader(dataset, batch_size: int, shuffle: bool = False,
                      num_workers: int = 1, collate_fn: Callable = default_collate,
                      **kw) -> DataLoader:
    """Reference ``create_dataloader`` surface (pipeline_utils.py:107-140)."""
    return DataLoader(dataset, batch_size, shuffle=shuffle,
                      num_workers=num_workers, collate_fn=collate_fn, **kw)
