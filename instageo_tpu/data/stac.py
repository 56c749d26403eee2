"""STAC API client + item-selection logic (pystac-client/stackstac-free).

Re-implements the reference's metadata stack (``instageo/data/stac_utils.py``)
over plain ``requests``:

* :class:`StacItem` / :class:`StacClient` — POST ``/search`` with pagination,
  rate limiting (10 searches/min) and exponential backoff, matching the
  reference's decorators (stac_utils.py:320-327);
* daytime filtering via an NOAA solar-position sunrise/sunset computation
  (the reference uses astral — stac_utils.py:72-90);
* candidate dispatch (point-within-item), per-timestep closest-item
  selection by minimum cloud cover within a temporal tolerance, validity
  rules (all timesteps found + unique) — stac_utils.py:116-202, 53-69;
* ``open_stac_items``: loads the selected COG assets over HTTP range reads
  into the (T·C, H, W) band-stacked layout (``{band}_{t}`` order) that the
  chip engine consumes, replacing stackstac (stac_utils.py:452-505).
"""

from __future__ import annotations

import logging
import math
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import requests

from instageo_tpu.data.geo_utils import make_valid_bbox, point_within
from instageo_tpu.data.remote_io import open_remote_geotiff
from instageo_tpu.data.settings import DATA_PIPELINE_SETTINGS
from instageo_tpu.utils.ratelimit import rate_limited, retry_backoff

log = logging.getLogger(__name__)


class StacAPIError(RuntimeError):
    pass


@dataclass
class StacItem:
    """Minimal STAC item: what the selection + loading paths need."""

    id: str
    collection: str
    bbox: Tuple[float, float, float, float]
    datetime: pd.Timestamp
    properties: Dict[str, Any] = field(default_factory=dict)
    assets: Dict[str, str] = field(default_factory=dict)  # name -> href

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "StacItem":
        dt = pd.to_datetime(d.get("properties", {}).get("datetime"), utc=True)
        assets = {k: v.get("href", "") for k, v in d.get("assets", {}).items()}
        return cls(
            id=d["id"],
            collection=d.get("collection", ""),
            bbox=tuple(d.get("bbox", (0, 0, 0, 0))),
            datetime=dt,
            properties=d.get("properties", {}),
            assets=assets,
        )

    def to_dict(self) -> Dict[str, Any]:
        return {
            "id": self.id,
            "collection": self.collection,
            "bbox": list(self.bbox),
            "properties": {**self.properties,
                           "datetime": self.datetime.isoformat()},
            "assets": {k: {"href": v} for k, v in self.assets.items()},
        }


class StacClient:
    """Minimal pystac-client replacement: POST search with pagination."""

    def __init__(self, url: str, session: Optional[requests.Session] = None,
                 headers: Optional[Dict[str, str]] = None) -> None:
        self.url = url.rstrip("/")
        self.session = session or requests.Session()
        self.headers = headers or {}

    @classmethod
    def open(cls, url: str, **kw) -> "StacClient":
        return cls(url, **kw)

    def search(
        self,
        collections: Sequence[str],
        datetime: Optional[str] = None,
        bbox: Optional[Sequence[float]] = None,
        query: Optional[Dict] = None,
        sortby: Optional[List[Dict]] = None,
        limit: int = 100,
        max_items: int = 1000,
    ) -> List[StacItem]:
        body: Dict[str, Any] = {"collections": list(collections), "limit": limit}
        if datetime:
            body["datetime"] = datetime
        if bbox:
            body["bbox"] = list(bbox)
        if query:
            body["query"] = query
        if sortby:
            body["sortby"] = sortby
        items: List[StacItem] = []
        url = f"{self.url}/search"
        next_body = body
        while url and len(items) < max_items:
            r = self.session.post(url, json=next_body, headers=self.headers,
                                  timeout=60)
            if r.status_code >= 400:
                raise StacAPIError(f"{r.status_code}: {r.text[:200]}")
            page = r.json()
            items.extend(StacItem.from_dict(f) for f in page.get("features", []))
            url = None
            for link in page.get("links", []):
                if link.get("rel") == "next":
                    url = link.get("href")
                    next_body = link.get("body", body)
                    break
        return items


# ---------------------------------------------------------------------------
# Solar daytime check (astral replacement)
# ---------------------------------------------------------------------------


def _sunrise_sunset_utc(lat: float, lon: float, date: pd.Timestamp
                        ) -> Optional[Tuple[pd.Timestamp, pd.Timestamp]]:
    """NOAA solar calculation; returns (sunrise, sunset) UTC or None (polar)."""
    day_of_year = date.dayofyear
    gamma = 2 * math.pi / 365 * (day_of_year - 1 + (12 - 12) / 24)
    eqtime = 229.18 * (0.000075 + 0.001868 * math.cos(gamma)
                       - 0.032077 * math.sin(gamma)
                       - 0.014615 * math.cos(2 * gamma)
                       - 0.040849 * math.sin(2 * gamma))
    decl = (0.006918 - 0.399912 * math.cos(gamma) + 0.070257 * math.sin(gamma)
            - 0.006758 * math.cos(2 * gamma) + 0.000907 * math.sin(2 * gamma)
            - 0.002697 * math.cos(3 * gamma) + 0.00148 * math.sin(3 * gamma))
    lat_r = math.radians(lat)
    zenith = math.radians(90.833)
    cos_ha = (math.cos(zenith) / (math.cos(lat_r) * math.cos(decl))
              - math.tan(lat_r) * math.tan(decl))
    if cos_ha > 1 or cos_ha < -1:
        return None  # polar day/night
    ha = math.degrees(math.acos(cos_ha))
    base = pd.Timestamp(year=date.year, month=date.month, day=date.day, tz="UTC")
    sunrise_min = 720 - 4 * (lon + ha) - eqtime
    sunset_min = 720 - 4 * (lon - ha) - eqtime
    return (base + pd.Timedelta(minutes=sunrise_min),
            base + pd.Timedelta(minutes=sunset_min))


def is_daytime(item: StacItem) -> bool:
    """True if the item's timestamp is between sunrise and sunset at its
    bbox centroid (reference stac_utils.py:72-90)."""
    if item.datetime is pd.NaT or item.datetime is None:
        return False
    lon = (item.bbox[0] + item.bbox[2]) / 2
    lat = (item.bbox[1] + item.bbox[3]) / 2
    ss = _sunrise_sunset_utc(lat, lon, item.datetime)
    if ss is None:
        return False
    sunrise, sunset = ss
    return sunrise <= item.datetime <= sunset


# ---------------------------------------------------------------------------
# Selection logic
# ---------------------------------------------------------------------------


def rename_stac_items(items: List[StacItem],
                      nameplate: Dict[str, Dict[str, str]]) -> List[StacItem]:
    """Normalize asset names per collection (stac_utils.py:93-113)."""
    for item in items:
        mapping = nameplate.get(item.collection)
        if mapping:
            for orig, new in mapping.items():
                if orig in item.assets:
                    item.assets[new] = item.assets.pop(orig)
    return items


def is_valid_dataset_entry(granules: Sequence[Optional[str]]) -> bool:
    """All timesteps found and unique (stac_utils.py:53-69)."""
    if any(g is None for g in granules):
        return False
    return len(granules) == len(set(granules))


def dispatch_candidate_items(
    tile_observations: pd.DataFrame,
    tile_candidate_items: List[StacItem],
    candidate_items_field: str,
) -> Optional[pd.DataFrame]:
    """Attach to each observation the items whose footprint contains it.

    Point-in-bbox version of the reference's sjoin-within
    (stac_utils.py:116-154); observation x/y must be EPSG:4326.
    """
    obs = tile_observations.copy()

    def candidates(row) -> List[StacItem]:
        return [it for it in tile_candidate_items
                if point_within(it.bbox, row.x, row.y)]

    cand = [candidates(row) for row in obs.itertuples()]
    if not any(cand):
        return None
    obs[candidate_items_field] = cand
    return obs


def find_closest_items(
    obsv: pd.Series,
    candidate_items_field: str,
    temporal_tolerance: int = 3,
    temporal_tolerance_minutes: int = 0,
) -> List[Optional[StacItem]]:
    """Per-timestep argmin cloud cover within ±tolerance (stac_utils:157-202)."""
    dates = obsv["tile_queries"][1]
    items = obsv.get(candidate_items_field, [])
    if not items:
        return [None] * len(dates)
    out: List[Optional[StacItem]] = []
    tol_minutes = temporal_tolerance * 24 * 60 + temporal_tolerance_minutes
    for date in dates:
        query_date = pd.to_datetime(date, utc=True)
        cands = [
            it for it in items
            if abs((it.datetime - query_date).total_seconds() / 60) <= tol_minutes
        ]
        if not cands:
            out.append(None)
        else:
            out.append(min(cands,
                           key=lambda it: it.properties.get("eo:cloud_cover", 100)))
    return out


# NOTE: decorating at whole-function granularity (one call per pipeline
# run) means the limiter effectively never throttles and a retry re-issues
# every prior tile's search; actual pacing is the per-tile sleep(1) below.
# This mirrors the reference exactly (stac_utils.py:320-327 decorates the
# same function the same way) — kept for behavior parity.
@rate_limited(DATA_PIPELINE_SETTINGS.METADATA_SEARCH_RATELIMIT, 60)
@retry_backoff((StacAPIError, RuntimeError, requests.RequestException),
               max_tries=5, max_time=300)
def retrieve_stac_metadata(
    client: StacClient,
    tile_info_df: pd.DataFrame,
    collections: List[str],
    bands_nameplate: Dict[str, Dict[str, str]],
    cloud_coverage: Optional[int] = 10,
    daytime_only: bool = False,
) -> Dict[str, List[StacItem]]:
    """Per-tile windowed search (stac_utils.py:320-389)."""
    items_dict: Dict[str, List[StacItem]] = {}
    for _, row in tile_info_df.iterrows():
        try:
            candidates = client.search(
                collections=collections,
                datetime=f"{row.min_date}/{row.max_date}",
                bbox=make_valid_bbox(row.lon_min, row.lat_min,
                                     row.lon_max, row.lat_max),
                sortby=[{"field": "datetime", "direction": "asc"}],
                query=None if cloud_coverage is None
                else {"eo:cloud_cover": {"lte": cloud_coverage}},
            )
        except StacAPIError as e:
            log.warning("API error for tile %s: %s", row.tile_id, e)
            time.sleep(60)
            continue
        if daytime_only:
            candidates = [it for it in candidates if is_daytime(it)]
        if not candidates:
            log.warning("No items found for %s", row.tile_id)
            continue
        items_dict[row.tile_id] = rename_stac_items(candidates, bands_nameplate)
        time.sleep(1)
    return items_dict


def find_best_items(
    data: pd.DataFrame,
    tiles_database: Dict[str, List[StacItem]],
    item_id_field: str,
    candidate_items_field: str,
    items_field: str,
    temporal_tolerance: int = 12,
    temporal_tolerance_minutes: int = 0,
) -> Dict[str, pd.DataFrame]:
    """Dispatch + closest-item selection per tile (stac_utils.py:392-449)."""
    best: Dict[str, pd.DataFrame] = {}
    for tile_id, items in tiles_database.items():
        tile_obsvs = data[data["mgrs_tile_id"] == tile_id]
        if tile_obsvs.empty:
            continue
        with_cands = dispatch_candidate_items(tile_obsvs, items,
                                              candidate_items_field)
        if with_cands is None:
            continue
        with_cands[items_field] = with_cands.apply(
            lambda o: find_closest_items(
                o, candidate_items_field,
                temporal_tolerance=temporal_tolerance,
                temporal_tolerance_minutes=temporal_tolerance_minutes),
            axis=1,
        )
        best[tile_id] = with_cands.drop(columns=[candidate_items_field])
    return best


def create_records_with_items(
    best_items: Dict[str, pd.DataFrame],
    granules_field: str,
    items_field: str,
) -> Tuple[pd.DataFrame, Dict[str, Any]]:
    """Build the per-granule-set dataset map (stac_utils.py:277-317)."""
    records = []
    dataset: Dict[str, Any] = {}
    for tile_id, obsvs in best_items.items():
        obsvs = obsvs.copy()
        obsvs[granules_field] = obsvs[items_field].apply(
            lambda its: [it.id if isinstance(it, StacItem) else None for it in its])
        obsvs = obsvs[obsvs[granules_field].apply(is_valid_dataset_entry)]
        if obsvs.empty:
            continue
        obsvs["stac_items_str"] = obsvs[granules_field].apply("_".join)
        for _, obsv in obsvs.drop_duplicates(subset=["stac_items_str"]).iterrows():
            dataset[obsv["stac_items_str"]] = {
                "granules": [it.to_dict() for it in obsv[items_field]]
            }
        records.append(obsvs.drop(columns=[items_field, granules_field],
                                  errors="ignore"))
    if not records:
        return pd.DataFrame(), {}
    return pd.concat(records, ignore_index=True), dataset


# ---------------------------------------------------------------------------
# COG loading (stackstac replacement)
# ---------------------------------------------------------------------------


@rate_limited(DATA_PIPELINE_SETTINGS.COG_DOWNLOAD_RATELIMIT, 60)
@retry_backoff((requests.RequestException, ValueError), max_tries=5, max_time=300)
def _load_asset(href: str, headers: Optional[Dict[str, str]] = None) -> Tuple:
    if href.startswith(("http://", "https://")):
        reader = open_remote_geotiff(href, headers=headers)
    else:
        from instageo_tpu.data.geotiff import GeoTiffReader

        reader = GeoTiffReader(href)
    with reader as r:
        return r.read(1), r.transform, r.crs


def open_stac_items(
    tile_dict: Dict[str, Any],
    bands_asset: List[str],
    mask_band: str,
    load_masks: bool = False,
    fill_value: float = 0,
    dtype: str = "uint16",
    sign_func: Optional[Callable[[str], str]] = None,
    headers: Optional[Dict[str, str]] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray], Any, int]:
    """Load granule COGs into the (T·C, H, W) band-stacked layout.

    Band order is ``b0_t0, b1_t0, …, b0_t1, …`` matching the reference's
    ``adjust_dims`` ``{band}_{t}`` stacking (data_pipeline.py:455-475).
    Returns (bands, masks | None, transform, epsg).

    All granules of a tile share the same MGRS EXTENT, but assets come at
    mixed resolutions on nesting grids (S2: 10 m B02-B04 at 10980² vs
    20 m B8A/B11/B12/SCL at 5490²; 10980 = 2·5490 = 6·1830). Coarser
    planes are upsampled to the finest grid by integer repetition
    (nearest neighbor — correct for SCL class codes and the standard
    alignment for SR bands); cropping to the smallest shape would keep
    only the top-left QUARTER of the 10 m bands and spatially misalign
    every band. The returned transform is the finest plane's.
    """
    granules = [StacItem.from_dict(g) if isinstance(g, dict) else g
                for g in tile_dict["granules"]]
    band_planes: List[Tuple[np.ndarray, Any, int]] = []
    mask_planes: List[Tuple[np.ndarray, Any, int]] = []
    for granule in granules:
        for asset in bands_asset:
            href = granule.assets[asset]
            if sign_func:
                href = sign_func(href)
            band_planes.append(_load_asset(href, headers))
        if load_masks:
            href = granule.assets[mask_band]
            if sign_func:
                href = sign_func(href)
            mask_planes.append(_load_asset(href, headers))

    all_planes = band_planes + mask_planes
    max_h = max(p.shape[0] for p, _, _ in all_planes)
    max_w = max(p.shape[1] for p, _, _ in all_planes)
    nesting = all(max_h % p.shape[0] == 0 and max_w % p.shape[1] == 0
                  for p, _, _ in all_planes)

    def _to_finest(p: np.ndarray) -> np.ndarray:
        fh, fw = max_h // p.shape[0], max_w // p.shape[1]
        if fh == 1 and fw == 1:
            return p
        return np.repeat(np.repeat(p, fh, axis=0), fw, axis=1)

    if nesting:
        transform, crs = next((t, c) for p, t, c in all_planes
                              if p.shape == (max_h, max_w))
        bands = np.stack([_to_finest(p) for p, _, _ in band_planes]
                         ).astype(dtype)
        masks = (np.stack([_to_finest(p) for p, _, _ in mask_planes])
                 if mask_planes else None)
        return bands, masks, transform, crs

    # Non-nesting shapes (not same-tile STAC assets): last-resort crop to
    # the common extent, loudly.
    log.warning("open_stac_items: non-nesting plane shapes %s — cropping "
                "to the smallest common extent",
                sorted({p.shape for p, _, _ in all_planes}))
    min_h = min(p.shape[0] for p, _, _ in all_planes)
    min_w = min(p.shape[1] for p, _, _ in all_planes)
    transform, crs = next(
        (t, c) for p, t, c in all_planes if p.shape[0] == min_h)
    bands = np.stack([p[:min_h, :min_w] for p, _, _ in band_planes]
                     ).astype(dtype)
    masks = (np.stack([p[:min_h, :min_w] for p, _, _ in mask_planes])
             if mask_planes else None)
    return bands, masks, transform, crs
