"""Data-pipeline core: tile grouping, temporal queries, chip orchestration.

Host-side counterpart of the reference ``instageo/data/data_pipeline.py``:
observation grouping into MGRS tiles, per-tile temporal search windows, and
the points/raster pipeline base classes that drive tile download → device
chip math (``instageo_tpu.ops.chip_ops``) → GeoTIFF writes. Dask's
distributed client is replaced by a process-local thread pool (network/IO
bound work; the per-chip compute now runs batched on the accelerator).
"""

from __future__ import annotations

import json
import logging
import os
from abc import ABC, abstractmethod
from concurrent.futures import ThreadPoolExecutor, as_completed
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from instageo_tpu.data.crs import Transformer, to_mgrs
from instageo_tpu.data.geotiff import Affine, write_geotiff
from instageo_tpu.data.settings import NO_DATA_VALUES, DATA_PIPELINE_SETTINGS
from instageo_tpu.ops.chip_ops import process_tile_chips

log = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Observation grouping (reference data_pipeline.py:270-382)
# ---------------------------------------------------------------------------


def reproject_coordinates(df: pd.DataFrame, source_epsg: int = 4326) -> pd.DataFrame:
    """Reproject x/y columns to EPSG:4326 (reference :330-349)."""
    t = Transformer.from_crs(source_epsg, 4326, always_xy=True)
    x, y = t.transform(df["x"].values, df["y"].values)
    df = df.copy()
    df["x"] = np.asarray(x)
    df["y"] = np.asarray(y)
    return df


def get_tiles(data: pd.DataFrame, src_crs: int = 4326,
              min_count: int = 100) -> pd.DataFrame:
    """Assign MGRS tiles and keep tiles with >= min_count observations.

    Reference :352-382.
    """
    if src_crs != 4326:
        data = reproject_coordinates(data, source_epsg=src_crs)
    if "mgrs_tile_id" not in data.columns:
        data = data.copy()
        data["mgrs_tile_id"] = [
            to_mgrs(row.y, row.x, 0) for row in data.itertuples()
        ]
    tile_counts = data.groupby("mgrs_tile_id").size().sort_values(ascending=False)
    data = pd.merge(data, tile_counts.reset_index(name="counts"), how="left",
                    on="mgrs_tile_id")
    sub = data[data["counts"] >= min_count]
    assert not sub.empty, "No observation records left"
    return sub


def get_tile_info(
    data: pd.DataFrame,
    num_steps: int = 3,
    temporal_step: int = 10,
    temporal_tolerance: int = 5,
    temporal_tolerance_minutes: int = 0,
) -> Tuple[pd.DataFrame, List[Tuple[str, List[str]]]]:
    """Per-tile date windows + per-observation temporal queries.

    Reference :270-327: each observation expands to ``num_steps`` dates going
    back ``temporal_step`` days; per-tile min/max dates are widened by the
    tolerance; max date pushed to end-of-day when no time component exists.
    """
    push_eod = "time" not in data.columns
    data = data[["mgrs_tile_id", "input_features_date", "x", "y"]].reset_index(drop=True)
    tile_queries = []
    rows = []
    for _, (tile_id, date, lon, lat) in data.iterrows():
        history = []
        for i in range(num_steps):
            curr = date - pd.Timedelta(days=temporal_step * i)
            history.append(curr.strftime("%Y-%m-%dT%H:%M:%S"))
            rows.append([tile_id, curr, lon, lat])
        tile_queries.append((tile_id, history))
    tile_info = (
        pd.DataFrame(rows, columns=["tile_id", "date", "lon", "lat"])
        .groupby("tile_id")
        .agg(min_date=("date", "min"), max_date=("date", "max"),
             lon_min=("lon", "min"), lon_max=("lon", "max"),
             lat_min=("lat", "min"), lat_max=("lat", "max"))
        .reset_index()
    )
    tol = temporal_tolerance + temporal_tolerance_minutes / (24 * 60)
    tile_info["min_date"] -= pd.Timedelta(days=tol)
    tile_info["max_date"] += pd.Timedelta(days=tol)
    tile_info["min_date"] = tile_info["min_date"].dt.strftime("%Y-%m-%dT%H:%M:%S")
    fmt = "%Y-%m-%dT23:59:59" if push_eod else "%Y-%m-%dT%H:%M:%S"
    tile_info["max_date"] = tile_info["max_date"].dt.strftime(fmt)
    return tile_info, tile_queries


def get_raster_tile_info(
    data: pd.DataFrame,
    num_steps: int = 3,
    temporal_step: int = 10,
    temporal_tolerance: int = 5,
    temporal_tolerance_minutes: int = 0,
) -> Tuple[pd.DataFrame, List[Tuple[str, List[str]]]]:
    """Raster-grid variant of :func:`get_tile_info` over ``bbox_4326`` rows.

    Reference ``get_raster_tile_info`` (stac_utils.py:205-274): per-tile
    union bbox instead of point extents.
    """
    push_eod = "time" not in data.columns
    df = data[["mgrs_tile_id", "input_features_date", "bbox_4326"]].reset_index(drop=True)
    tile_queries: List[Tuple[str, List[str]]] = []
    rows: List[List[Any]] = []
    for _, (tile_id, date, bbox) in df.iterrows():
        history = []
        for i in range(num_steps):
            curr = pd.to_datetime(date) - pd.Timedelta(days=temporal_step * i)
            history.append(curr.strftime("%Y-%m-%dT%H:%M:%S"))
            rows.append([tile_id, curr, bbox])
        tile_queries.append((tile_id, history))
    tmp = pd.DataFrame(rows, columns=["tile_id", "date", "bbox"])
    agg = tmp.groupby("tile_id").agg(
        min_date=("date", "min"), max_date=("date", "max"),
        lon_min=("bbox", lambda b: min(v[0] for v in b)),
        lat_min=("bbox", lambda b: min(v[1] for v in b)),
        lon_max=("bbox", lambda b: max(v[2] for v in b)),
        lat_max=("bbox", lambda b: max(v[3] for v in b)),
    ).reset_index()
    tol = temporal_tolerance + temporal_tolerance_minutes / (24 * 60)
    agg["min_date"] -= pd.Timedelta(days=tol)
    agg["max_date"] += pd.Timedelta(days=tol)
    agg["min_date"] = agg["min_date"].dt.strftime("%Y-%m-%dT%H:%M:%S")
    fmt = "%Y-%m-%dT23:59:59" if push_eod else "%Y-%m-%dT%H:%M:%S"
    agg["max_date"] = agg["max_date"].dt.strftime(fmt)
    return agg[["tile_id", "min_date", "max_date",
                "lon_min", "lon_max", "lat_min", "lat_max"]], tile_queries


def get_chip_coords(xs: np.ndarray, ys: np.ndarray, transform: Affine,
                    chip_size: int) -> np.ndarray:
    """Unique (x, y) chip-grid indices for points (reference :424-443)."""
    inv = transform.invert()
    cols = np.floor(inv.a * xs + inv.b * ys + inv.c).astype(int)
    rows = np.floor(inv.d * xs + inv.e * ys + inv.f).astype(int)
    return np.unique(np.stack((cols // chip_size, rows // chip_size), axis=-1),
                     axis=0)


def point_rowcol(xs: np.ndarray, ys: np.ndarray, transform: Affine) -> np.ndarray:
    """(row, col) pixel indices for points under a transform."""
    inv = transform.invert()
    cols = np.floor(inv.a * xs + inv.b * ys + inv.c).astype(int)
    rows = np.floor(inv.d * xs + inv.e * ys + inv.f).astype(int)
    return np.stack([rows, cols], axis=-1)


# ---------------------------------------------------------------------------
# Chip creation (device math + file IO)
# ---------------------------------------------------------------------------


def create_and_save_chips_with_seg_maps(
    tile_array: np.ndarray,
    mask_array: Optional[np.ndarray],
    transform: Affine,
    crs: int,
    tile_id: str,
    df: pd.DataFrame,
    chip_size: int,
    output_directory: str,
    no_data_value: float,
    src_crs: int,
    data_source: str,
    mask_types: Sequence[str],
    masking_strategy: str,
    window_size: int,
    task_type: str = "seg",
    chip_dtype: Optional[np.dtype] = None,
) -> Tuple[List[str], List[Optional[str]]]:
    """Slice a loaded tile into chips + seg maps and write both.

    Device-batched equivalent of reference ``create_and_save_chips_with_
    seg_maps`` (data_pipeline.py:101-226): chip ids are
    ``chip_{date}_{tile}_{x}_{y}.tif``; empty chips and label-less seg maps
    are skipped; existing files are skipped (idempotent resume).
    """
    df = df.copy()
    if src_crs != crs:
        t = Transformer.from_crs(src_crs, crs, always_xy=True)
        x, y = t.transform(df["x"].values, df["y"].values)
        df["x"], df["y"] = np.asarray(x), np.asarray(y)
    h, w = tile_array.shape[-2:]
    x_min, y_max = transform * (0, 0)
    x_max, y_min = transform * (w, h)
    lo_x, hi_x = sorted((x_min, x_max))
    lo_y, hi_y = sorted((y_min, y_max))
    df = df[(df.x >= lo_x) & (df.x <= hi_x) & (df.y >= lo_y) & (df.y <= hi_y)]
    if df.empty:
        return [], []

    os.makedirs(os.path.join(output_directory, "chips"), exist_ok=True)
    os.makedirs(os.path.join(output_directory, "seg_maps"), exist_ok=True)
    date_id = pd.to_datetime(df.iloc[0]["date"]).strftime("%Y%m%d")

    n_chips_x = w // chip_size
    n_chips_y = h // chip_size
    coords = get_chip_coords(df.x.values, df.y.values, transform, chip_size)
    keep = [(x, y) for x, y in coords if x < n_chips_x and y < n_chips_y]

    todo = []
    for x, y in keep:
        chip_name = f"chip_{date_id}_{tile_id}_{x}_{y}.tif"
        seg_name = f"seg_map_{date_id}_{tile_id}_{x}_{y}.tif"
        chip_path = os.path.join(output_directory, "chips", chip_name)
        seg_path = os.path.join(output_directory, "seg_maps", seg_name)
        if os.path.exists(chip_path) or os.path.exists(seg_path):
            continue
        todo.append((x, y, chip_name, seg_name, chip_path, seg_path))
    if not todo:
        return [], []

    chip_coords = np.asarray([(t_[0], t_[1]) for t_ in todo], np.int32)
    rc = point_rowcol(df.x.values, df.y.values, transform)
    # Owning chip per point.
    owner = np.full(len(df), -1, np.int64)
    coord_index = {tuple(c): i for i, c in enumerate(chip_coords.tolist())}
    pc = np.stack([rc[:, 1] // chip_size, rc[:, 0] // chip_size], axis=-1)
    for i, c in enumerate(pc.tolist()):
        owner[i] = coord_index.get(tuple(c), -1)

    labels = df["label"].values.astype(np.float32) if "label" in df.columns else (
        np.zeros(len(df), np.float32))

    chips_arr, seg_arr, chip_valid, seg_valid = process_tile_chips(
        tile_array, mask_array, chip_coords, rc, labels, owner,
        chip_size=chip_size, no_data_value=no_data_value,
        data_source=data_source, mask_types=mask_types,
        masking_strategy=masking_strategy, window_size=window_size,
        is_reg=(task_type == "reg"),
    )

    chips: List[str] = []
    seg_maps: List[Optional[str]] = []
    dtype = chip_dtype or tile_array.dtype
    for i, (x, y, chip_name, seg_name, chip_path, seg_path) in enumerate(todo):
        if not chip_valid[i] or not seg_valid[i]:
            continue
        x0, y0 = transform * (x * chip_size, y * chip_size)
        chip_tr = Affine(transform.a, transform.b, x0, transform.d, transform.e, y0)
        seg_dtype = np.float32 if task_type == "reg" else np.int16
        write_geotiff(seg_path, seg_arr[i].astype(seg_dtype)[None],
                      transform=chip_tr, crs=crs, nodata=NO_DATA_VALUES.SEG_MAP)
        seg_maps.append(seg_name)
        write_geotiff(chip_path, chips_arr[i].astype(dtype),
                      transform=chip_tr, crs=crs, nodata=no_data_value)
        chips.append(chip_name)
    return chips, seg_maps


# ---------------------------------------------------------------------------
# Pipeline base classes (reference data_pipeline.py:478-831)
# ---------------------------------------------------------------------------


class BaseDataPipeline(ABC):
    """Shared orchestration: resume filter, worker pool, CSV output."""

    def __init__(self, output_directory: str, chip_size: int = 256,
                 src_crs: int = 4326, mask_types: Sequence[str] = (),
                 masking_strategy: str = "each", window_size: int = 0,
                 task_type: str = "seg", num_workers: int = 4,
                 spatial_resolution: float = 0.0002694945852358564) -> None:
        self.output_directory = output_directory
        self.chip_size = chip_size
        self.src_crs = src_crs
        self.mask_types = list(mask_types)
        self.masking_strategy = masking_strategy
        self.window_size = window_size
        self.task_type = task_type
        self.num_workers = num_workers
        self.spatial_resolution = spatial_resolution

    @property
    @abstractmethod
    def data_source(self) -> str:
        ...

    @abstractmethod
    def load_tile(self, key: str, granules: Any) -> Optional[Tuple]:
        """Fetch/decode one tile -> (tile_array, mask_array, transform, crs,
        tile_id) or None on failure."""

    def _load_state(self, state_path: str) -> list:
        if not os.path.exists(state_path):
            return []
        try:
            with open(state_path) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError) as e:
            # A corrupt resume file must not wedge the pipeline into
            # failing every tile forever — start over (idempotent chip
            # writes make reprocessing safe) and say so.
            log.warning("Corrupt resume state %s (%s): reprocessing all "
                        "tiles", state_path, e)
            return []

    def _is_processed(self, key: str, state_path: str) -> bool:
        return key in self._load_state(state_path)

    def _mark_processed(self, key: str, state_path: str) -> None:
        state = self._load_state(state_path)
        if key not in state:
            state.append(key)
        # Atomic replace: a crash mid-write must never leave truncated
        # JSON (the resume mechanism would otherwise become the failure).
        tmp = state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, state_path)

    def run(self, dataset: pd.DataFrame, obsv_records: Dict[str, pd.DataFrame]
            ) -> pd.DataFrame:
        """Process all tiles; returns the Input/Label manifest DataFrame.

        ``obsv_records`` maps a tile key (serialized granule set) to the
        observation records it serves (reference run(): :656-831).
        """
        os.makedirs(self.output_directory, exist_ok=True)
        state_path = os.path.join(self.output_directory, "processed_tiles.json")
        manifest_rows: List[Dict[str, str]] = []

        def process(key: str) -> Optional[List[Dict[str, str]]]:
            if self._is_processed(key, state_path):
                return []
            loaded = self.load_tile(key, dataset)
            if loaded is None:
                # Load/decode failed (e.g. transient network error): return a
                # sentinel so the key is NOT marked processed and a re-run
                # retries it — marking it would silently drop the tile forever.
                return None
            tile_array, mask_array, transform, crs, tile_id = loaded
            df = obsv_records[key]
            chips, seg_maps = create_and_save_chips_with_seg_maps(
                tile_array, mask_array, transform, crs, tile_id, df,
                chip_size=self.chip_size,
                output_directory=self.output_directory,
                no_data_value=self.no_data_value,
                src_crs=self.src_crs,
                data_source=self.data_source,
                mask_types=self.mask_types,
                masking_strategy=self.masking_strategy,
                window_size=self.window_size,
                task_type=self.task_type,
            )
            return [
                {"Input": f"chips/{c}", "Label": f"seg_maps/{s}"}
                for c, s in zip(chips, seg_maps)
            ]

        with ThreadPoolExecutor(self.num_workers) as pool:
            futs = {pool.submit(process, k): k for k in obsv_records}
            for fut in as_completed(futs):
                key = futs[fut]
                try:
                    rows = fut.result()
                    if rows is None:
                        log.warning("Tile %s failed to load; left unmarked "
                                    "for retry on resume", key)
                        continue
                    manifest_rows.extend(rows)
                    self._mark_processed(key, state_path)
                except Exception as e:
                    log.error("Tile %s failed: %s", key, e)

        manifest = pd.DataFrame(manifest_rows)
        out_csv = os.path.join(
            self.output_directory,
            f"{self.data_source.lower()}_dataset.csv")
        if os.path.exists(out_csv):
            # Resume contract: tiles already in processed_tiles.json
            # return no rows this run — MERGE with the previous manifest
            # or the CSV would be rewritten with only the new tiles'
            # chips, silently dropping everything processed earlier.
            try:
                prev = pd.read_csv(out_csv)
            except pd.errors.EmptyDataError:
                prev = pd.DataFrame()
            manifest = pd.concat([prev, manifest], ignore_index=True)
            if "Input" in manifest.columns:
                manifest = manifest.drop_duplicates(
                    subset=["Input"], keep="last", ignore_index=True)
        manifest.to_csv(out_csv, index=False)
        return manifest

    @property
    def no_data_value(self) -> float:
        return getattr(NO_DATA_VALUES, self.data_source, 0)


class BaseRasterPipeline(BaseDataPipeline):
    """Raster/bbox-grid pipeline: fixed chip grid, labels from rasters.

    Equivalent of the reference ``BaseRasterDataPipeline``
    (data_pipeline.py:478-653): each observation row carries a chip bbox
    (``bbox`` column) and a ``label_filename``; chips are sliced to exactly
    ``chip_size`` from the loaded tile, QA-masked, and written uint16; with
    ``is_bbox_feature`` (the web-backend path) no labels are produced.
    """

    def __init__(self, *args, raster_path: str = "", qa_check: bool = True,
                 is_bbox_feature: bool = False, **kw) -> None:
        super().__init__(*args, **kw)
        self.raster_path = raster_path
        self.qa_check = qa_check
        self.is_bbox_feature = is_bbox_feature

    def process_row(self, row: Dict[str, Any], tile_loaded: Tuple) -> Optional[
            Tuple[str, Optional[str]]]:
        """One grid chip: slice -> mask -> (optional) label -> write."""
        from instageo_tpu.data.geo_utils import slice_raster_window
        from instageo_tpu.data.geotiff import GeoTiffReader
        from instageo_tpu.ops.chip_ops import (
            apply_mask as apply_mask_jnp,
            mask_segmentation_map as mask_seg_jnp,
        )
        import jax.numpy as jnp

        tile_array, mask_array, transform, crs, _tile_id = tile_loaded
        label_filename = (
            f"{os.path.splitext(row['label_filename'])[0]}_{row['mgrs_tile_id']}")
        chip_filename = label_filename.replace("mask", "merged").replace(
            "label", "chip")
        chip_path = os.path.join(self.output_directory, "chips",
                                 f"{chip_filename}.tif")
        label_path = os.path.join(self.output_directory, "seg_maps",
                                  f"{label_filename}.tif")
        if os.path.exists(chip_path) and (self.is_bbox_feature
                                          or os.path.exists(label_path)):
            return chip_path, (None if self.is_bbox_feature else label_path)

        sliced = slice_raster_window(
            tile_array, transform, row["bbox"], bbox_crs=self.src_crs,
            raster_crs=crs, chip_size=self.chip_size)
        if sliced is None:
            return None
        chip, chip_tr = sliced
        if chip.shape[-1] < self.chip_size or chip.shape[-2] < self.chip_size:
            return None

        if mask_array is not None and self.mask_types:
            msliced = slice_raster_window(
                mask_array, transform, row["bbox"], bbox_crs=self.src_crs,
                raster_crs=crs, chip_size=self.chip_size)
            if msliced is not None:
                chip = np.asarray(apply_mask_jnp(
                    jnp.asarray(chip.astype(np.float32))[None],
                    jnp.asarray(msliced[0])[None],
                    self.no_data_value, self.data_source,
                    self.mask_types, self.masking_strategy)[0])

        chip = np.clip(chip, 0, 10000)

        seg_map = None
        if not self.is_bbox_feature:
            with GeoTiffReader(os.path.join(self.raster_path,
                                            row["label_filename"])) as r:
                seg_map = r.read(1)
            if seg_map.shape != chip.shape[-2:]:
                log.warning("Skipping %s due to invalid shapes", label_filename)
                return None
            if self.qa_check:
                if not (chip != self.no_data_value).any():
                    return None
                seg_map = np.asarray(mask_seg_jnp(
                    jnp.asarray(chip.astype(np.float32)),
                    jnp.asarray(seg_map.astype(np.float32)),
                    self.no_data_value, self.masking_strategy))
                if not (seg_map != NO_DATA_VALUES.SEG_MAP).any():
                    return None

        chip_u16 = np.where(np.isnan(chip), self.no_data_value, chip).astype(np.uint16)
        write_geotiff(chip_path, chip_u16, transform=chip_tr, crs=crs,
                      nodata=self.no_data_value)
        if seg_map is not None:
            seg_dtype = np.int8 if self.task_type == "seg" else np.float32
            seg_out = np.where(np.isnan(seg_map), NO_DATA_VALUES.SEG_MAP,
                               seg_map).astype(seg_dtype)
            write_geotiff(label_path, seg_out[None], transform=chip_tr, crs=crs,
                          nodata=NO_DATA_VALUES.SEG_MAP)
            return chip_path, label_path
        return chip_path, None

    def run(self, dataset: Dict[str, Any], obsv_records: pd.DataFrame
            ) -> pd.DataFrame:
        """Grid-record driven run (reference :595-653)."""
        os.makedirs(os.path.join(self.output_directory, "chips"), exist_ok=True)
        os.makedirs(os.path.join(self.output_directory, "seg_maps"), exist_ok=True)

        tile_cache: Dict[str, Optional[Tuple]] = {}

        def get_tile(key: str) -> Optional[Tuple]:
            if key not in tile_cache:
                tile_cache[key] = self.load_tile(key, dataset)
            return tile_cache[key]

        chip_paths: List[str] = []
        label_paths: List[Optional[str]] = []
        batch = DATA_PIPELINE_SETTINGS.BATCH_SIZE

        def one(row: pd.Series) -> Optional[Tuple[str, Optional[str]]]:
            # Per-row try/except with continue (reference batch-level
            # resilience, data_pipeline.py:637-646): one bad row must not
            # kill the batch.
            try:
                loaded = get_tile(row["stac_items_str"])
                if loaded is None:
                    return None
                return self.process_row(row.to_dict(), loaded)
            except Exception as e:
                log.error("Row %s failed: %s", row.get("label_filename"), e)
                return None

        with ThreadPoolExecutor(self.num_workers) as pool:
            for i in range(0, len(obsv_records), batch):
                rows = [r for _, r in obsv_records.iloc[i : i + batch].iterrows()]
                for res in pool.map(one, rows):
                    if res is not None:
                        chip_paths.append(res[0])
                        label_paths.append(res[1])

        if self.is_bbox_feature:
            df = pd.DataFrame({"Input": chip_paths})
        else:
            df = pd.DataFrame({"Input": chip_paths, "Label": label_paths})
        out = os.path.join(self.output_directory,
                           f"{self.data_source.lower()}_raster_dataset.csv")
        df.to_csv(out)
        return df
