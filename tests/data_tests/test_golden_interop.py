"""Golden interop tests against real GDAL-written HLS fixtures.

The reference ships small real rasters (an HLS B02 granule crop, an Fmask,
an 18-band chip + mask pair — tests/data/). Decoding them with the
framework's own codec (and native decoder) validates real-world GeoTIFF
interop beyond our writer's dialect.
"""

import os

import numpy as np
import pytest

REF_DATA = "/root/reference/tests/data"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_DATA),
                                reason="reference fixtures unavailable")

from instageo_tpu.data.geotiff import GeoTiffReader  # noqa: E402
from instageo_tpu import native  # noqa: E402


def test_hls_granule_decode_and_geo():
    path = os.path.join(REF_DATA, "HLS.S30.T38PMB.2022145T072619.v2.0.B02.tif")
    with GeoTiffReader(path) as r:
        arr = r.read(1)
        assert (r.width, r.height) == (224, 224)
        # the fixture is a Wyoming crop (UTM 13N) carrying an HLS-style name
        assert r.crs == 32613
        t = r.transform
        assert t is not None and t.a == 30.0 and t.e == -30.0
    assert np.isfinite(arr.astype(np.float64)).all()

    import cv2

    ref = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    np.testing.assert_allclose(arr.astype(np.float64), ref, rtol=1e-12)


def test_fmask_decode_bits():
    from instageo_tpu.ops.chip_ops import decode_fmask_value

    import jax.numpy as jnp

    path = os.path.join(REF_DATA, "fmask.tif")
    with GeoTiffReader(path) as r:
        fmask = r.read(1)
    import cv2

    np.testing.assert_array_equal(fmask,
                                  cv2.imread(path, cv2.IMREAD_UNCHANGED))
    cloud = np.asarray(decode_fmask_value(jnp.asarray(fmask.astype(np.int32)), 1))
    assert set(np.unique(cloud)) <= {0, 1}
    water = np.asarray(decode_fmask_value(jnp.asarray(fmask.astype(np.int32)), 5))
    assert set(np.unique(water)) <= {0, 1}


def test_multiband_chip_and_mask_pair():
    """18-band chip that cv2/libtiff can't even open (>4 channels)."""
    chip_path = os.path.join(REF_DATA, "chip_178_022.tif")
    mask_path = os.path.join(REF_DATA, "chip_178_022.mask.tif")
    with GeoTiffReader(chip_path) as r:
        chip = r.read()
        assert r.count == 18  # 3 timesteps x 6 bands
    with GeoTiffReader(mask_path) as r:
        mask = r.read(1)
    assert chip.shape[1:] == mask.shape

    from instageo_tpu.data.dataloader import mask_label_with_chip

    # runs on real data without error; the pair is a valid training sample
    assert mask_label_with_chip(chip_path, mask_path,
                                chip_no_data_value=0,
                                label_no_data_value=-1) in (True, False)


def test_native_decoder_on_real_fixtures():
    if not native.available():
        pytest.skip("native decoder not built")
    for name in ("HLS.S30.T38PMB.2022145T072619.v2.0.B02.tif",
                 "fmask.tif", "chip_178_022.tif"):
        path = os.path.join(REF_DATA, name)
        with GeoTiffReader(path) as r:
            ref = r.read()
        got = native.read_geotiff_native(path)
        np.testing.assert_array_equal(got, ref)


def test_get_tiles_on_real_observations():
    import pandas as pd

    from instageo_tpu.data.pipeline import get_tiles

    df = pd.read_csv(os.path.join(REF_DATA, "sample_4326.csv"))
    out = get_tiles(df, src_crs=4326, min_count=1)
    assert "mgrs_tile_id" in out.columns
    # All points are in south-central Wyoming -> zone 13T tiles.
    assert all(t.startswith("13T") for t in out["mgrs_tile_id"])
