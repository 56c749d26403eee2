"""Raster chip creator record loading: CRS handling + grid parity."""

import numpy as np
import pandas as pd
import pytest

from instageo_tpu.data.crs import Transformer, to_mgrs
from instageo_tpu.data.geotiff import Affine, write_geotiff


@pytest.fixture()
def _flags():
    from instageo_tpu.data import raster_chip_creator as rcc

    rcc.FLAGS.unparse_flags()
    return rcc


def test_load_grid_records_reprojects_utm_rasters(tmp_path, _flags):
    """A UTM label raster must yield a true-4326 bbox_4326 (the original
    code passed UTM meters to the MGRS lookup and crashed)."""
    rcc = _flags
    # 32x32 raster at UTM 33N (500000, 4762000) ~ (43.0, 15.0)
    tr = Affine.from_origin(500000.0, 4762000.0, 30.0, 30.0)
    lab = np.zeros((1, 32, 32), np.int16)
    write_geotiff(str(tmp_path / "label_0.tif"), lab, transform=tr,
                  crs=32633, nodata=-1)
    pd.DataFrame([{"label_filename": "label_0.tif", "date": "2022-05-25"}]
                 ).to_csv(tmp_path / "records.csv", index=False)

    rcc.FLAGS(["x", f"--records_file={tmp_path / 'records.csv'}",
               f"--raster_path={tmp_path}", "--output_directory=/tmp/na",
               "--data_source=HLS"])
    grid = rcc._load_grid_records()
    assert len(grid) == 1
    row = grid.iloc[0]
    # bbox_4326 is lon/lat, not meters
    w, s, e, n = row["bbox_4326"]
    assert -180 <= w <= e <= 180 and -90 <= s <= n <= 90
    # and round-trips to the raster's location
    t = Transformer.from_crs(32633, 4326, always_xy=True)
    lon, lat = t.transform(500000.0 + 16 * 30, 4762000.0 - 16 * 30)
    assert w <= float(lon) <= e and s <= float(lat) <= n
    # MGRS id comes from the true lat/lon
    assert row["mgrs_tile_id"] == to_mgrs(float(lat), float(lon), 0)
    # default src_crs=4326: the pipeline-facing bbox matches bbox_4326
    assert row["bbox"] == pytest.approx(row["bbox_4326"])


def test_load_grid_records_4326_passthrough(tmp_path, _flags):
    rcc = _flags
    tr = Affine.from_origin(10.0, 45.0, 0.001, 0.001)
    lab = np.zeros((1, 16, 16), np.int16)
    write_geotiff(str(tmp_path / "label_1.tif"), lab, transform=tr,
                  crs=4326, nodata=-1)
    pd.DataFrame([{"label_filename": "label_1.tif", "date": "2023-01-01"}]
                 ).to_csv(tmp_path / "records.csv", index=False)
    rcc.FLAGS(["x", f"--records_file={tmp_path / 'records.csv'}",
               f"--raster_path={tmp_path}", "--output_directory=/tmp/na",
               "--data_source=HLS"])
    grid = rcc._load_grid_records()
    assert grid.iloc[0]["bbox_4326"] == pytest.approx(
        (10.0, 45.0 - 16 * 0.001, 10.0 + 16 * 0.001, 45.0))
