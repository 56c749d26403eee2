"""Data-layer settings (env-overridable), mirroring the reference surface.

Reference: ``instageo/data/settings.py`` (pydantic BaseSettings). The same
values and env names are supported via plain pydantic models initialized
from ``os.environ`` (pydantic-settings is not in the image).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

from pydantic import BaseModel


def _env(name: str, default, cast=None):
    v = os.environ.get(name)
    if v is None:
        return default
    return cast(v) if cast else v


class GDALOptions(BaseModel):
    """COG access tuning (the reference passes these to GDAL; our reader
    uses them for HTTP range-read behavior)."""

    GDAL_HTTP_MULTIRANGE: str = "YES"
    GDAL_HTTP_MERGE_CONSECUTIVE_RANGES: str = "YES"
    GDAL_HTTP_MAX_RETRY: int = 5
    GDAL_HTTP_RETRY_DELAY: int = 2
    CPL_VSIL_CURL_CACHE_SIZE: int = 32 * 1024 * 1024

    @staticmethod
    def get_access_token() -> Optional[str]:
        """NASA EarthData bearer token (reference settings.py:32-77).

        In tests (TESTING=true) returns None without network auth.
        """
        if os.environ.get("TESTING", "").lower() == "true":
            return None
        return os.environ.get("EARTHDATA_TOKEN")


class NoDataValues(BaseModel):
    HLS: int = 0
    S2: int = 0
    S1: float = -1.0
    SEG_MAP: int = -1


class BlockSizes(BaseModel):
    HLS: int = 256
    S2: int = 1024
    S1: int = 1024


class BandsSettings(BaseModel):
    """Asset names per source + nameplate normalization maps."""

    HLS_ASSETS: List[str] = ["B02", "B03", "B04", "B8A", "B11", "B12"]
    HLS_L30_ASSETS: List[str] = ["B02", "B03", "B04", "B05", "B06", "B07"]
    HLS_MASK_ASSET: str = "Fmask"
    S2_ASSETS: List[str] = ["B02", "B03", "B04", "B8A", "B11", "B12"]
    S2_MASK_ASSET: str = "SCL"
    S1_ASSETS: List[str] = ["vv", "vh"]
    # Collection-specific asset-name normalization (reference :117-222).
    NAMEPLATES: Dict[str, Dict[str, str]] = {
        "sentinel-2-l2a": {
            "blue": "B02", "green": "B03", "red": "B04",
            "nir08": "B8A", "swir16": "B11", "swir22": "B12", "scl": "SCL",
        },
    }


class HLSAPISettings(BaseModel):
    URL: str = "https://cmr.earthdata.nasa.gov/stac/LPCLOUD"
    COLLECTIONS: List[str] = ["HLSL30_2.0", "HLSS30_2.0"]


class S2APISettings(BaseModel):
    URL: str = "https://planetarycomputer.microsoft.com/api/stac/v1"
    COLLECTIONS: List[str] = ["sentinel-2-l2a"]


class S1APISettings(BaseModel):
    URL: str = "https://planetarycomputer.microsoft.com/api/stac/v1"
    COLLECTIONS: List[str] = ["sentinel-1-rtc"]


class DataPipelineSettings(BaseModel):
    # The reference's experiment scripts export the class-prefixed
    # spelling (DATAPIPELINESETTINGS_BATCH_SIZE — us_cdl_instageo.sh);
    # honor it first, then the INSTAGEO_* spelling.
    BATCH_SIZE: int = int(_env("DATAPIPELINESETTINGS_BATCH_SIZE",
                               _env("INSTAGEO_BATCH_SIZE", 16, int), int))
    METADATA_SEARCH_RATELIMIT: int = int(
        _env("DATAPIPELINESETTINGS_METADATA_SEARCH_RATELIMIT",
             _env("INSTAGEO_SEARCH_RATELIMIT", 10, int), int))
    COG_DOWNLOAD_RATELIMIT: int = int(
        _env("DATAPIPELINESETTINGS_COG_DOWNLOAD_RATELIMIT",
             _env("INSTAGEO_COG_RATELIMIT", 30, int), int))


GDAL_OPTIONS = GDALOptions()
NO_DATA_VALUES = NoDataValues()
BLOCK_SIZES = BlockSizes()
BANDS_SETTINGS = BandsSettings()
HLS_API = HLSAPISettings()
S2_API = S2APISettings()
S1_API = S1APISettings()
DATA_PIPELINE_SETTINGS = DataPipelineSettings()

# Microsoft Planetary Computer STAC API (reference data_pipeline.py:54)
MPC_STAC_API_URL = S2_API.URL
