"""CRS/MGRS math tests: literature test vectors + roundtrip invariants."""

import numpy as np
import pytest

from instageo_tpu.data.crs import (
    Transformer,
    haversine_km,
    latlon_to_utm,
    mgrs_to_latlon,
    to_mgrs,
    utm_epsg,
    utm_to_latlon,
    utm_zone,
)

# UTM test points: CN Tower's coordinates are an exact published vector
# (tolerance 1.5 m); the others are landmark-level sanity anchors (300 m).
KNOWN = [
    (43.642567, -79.387139, 17, 630084, 4833439, 1.5),
    (48.8583701, 2.2944813, 31, 448252, 5411950, 300),
    (-33.8568, 151.2153, 56, 334890, 6252280, 300),
]


@pytest.mark.parametrize("lat,lon,zone,e,n,tol", KNOWN)
def test_utm_known_points(lat, lon, zone, e, n, tol):
    ee, nn, z, south = latlon_to_utm(lat, lon)
    assert z == zone
    assert south == (lat < 0)
    assert abs(float(ee) - e) < tol
    assert abs(float(nn) - n) < tol


def test_utm_roundtrip_grid():
    rng = np.random.default_rng(0)
    lats = rng.uniform(-79, 83, 200)
    lons = rng.uniform(-179, 179, 200)
    for lat, lon in zip(lats, lons):
        e, n, zone, south = latlon_to_utm(lat, lon)
        lat2, lon2 = utm_to_latlon(e, n, zone, south)
        assert abs(float(lat2) - lat) < 1e-8
        assert abs(float(lon2) - lon) < 1e-8


def test_utm_invariants():
    # Central meridian of zone 33 is 15E: easting = 500000.
    e, n, zone, _ = latlon_to_utm(45.0, 15.0)
    assert zone == 33
    assert abs(float(e) - 500000) < 1e-6
    # Equator northing 0 in the north.
    _, n0, _, south = latlon_to_utm(0.0, 10.0)
    assert abs(float(n0)) < 1e-6 and not south


def test_zone_exceptions():
    assert utm_zone(60.0, 5.0) == 32  # Norway
    assert utm_zone(75.0, 8.0) == 31  # Svalbard
    assert utm_zone(75.0, 20.0) == 33
    assert utm_epsg(43.6, -79.4) == 32617
    assert utm_epsg(-33.8, 151.2) == 32756


def test_transformer_roundtrip_vectorized():
    t = Transformer.from_crs("EPSG:4326", 32617, always_xy=True)
    lons = np.array([-79.4, -79.3])
    lats = np.array([43.6, 43.7])
    e, n = t.transform(lons, lats)
    back = Transformer.from_crs(32617, 4326).transform(e, n)
    np.testing.assert_allclose(back[0], lons, atol=1e-8)
    np.testing.assert_allclose(back[1], lats, atol=1e-8)


@pytest.mark.parametrize("lat,lon,expected", [
    (43.642567, -79.387139, "17TPJ"),   # CN Tower
    (48.8583701, 2.2944813, "31UDQ"),   # Eiffel Tower
    (-33.8568, 151.2153, "56HLH"),      # Sydney
])
def test_mgrs_precision0(lat, lon, expected):
    assert to_mgrs(lat, lon, precision=0) == expected


def test_mgrs_precision5_contains_point():
    code = to_mgrs(43.642567, -79.387139, precision=5)
    assert code.startswith("17TPJ")
    assert code == "17TPJ3008433438" or abs(int(code[5:10]) - 30084) <= 1


def test_mgrs_decode_center_close_to_origin_point():
    lat, lon = 43.642567, -79.387139
    code = to_mgrs(lat, lon, precision=0)
    clat, clon = mgrs_to_latlon(code)
    # center of the 100km square must be within ~75km of the point
    assert haversine_km(lat, lon, clat, clon) < 75


def test_mgrs_decode_precision5_is_exact():
    lat, lon = -33.8568, 151.2153
    code = to_mgrs(lat, lon, precision=5)
    clat, clon = mgrs_to_latlon(code)
    assert haversine_km(lat, lon, clat, clon) < 0.002  # within ~1.4m half-diag


def test_haversine():
    # Paris -> Toronto is ~6000 km
    d = float(haversine_km(48.8584, 2.2945, 43.6426, -79.3871))
    assert 5900 < d < 6100
    assert float(haversine_km(10, 20, 10, 20)) == 0
