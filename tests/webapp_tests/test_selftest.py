"""SPA selftest plumbing: goldens stay in sync and the page is served.

The browser-side execution itself needs a JS engine (none in this image);
these tests pin everything CI can pin: the golden vectors match the
Python tiler/CRS stack that generated them, the committed JSON is
current, the page's module imports resolve to served files, and the JS
formulas' Python twins agree with the goldens (so a browser run can only
fail if the JS diverges from the formulas asserted here).
"""

import json
import math
import os
import re

import pytest

from instageo_tpu.webapp import selftest_goldens

STATIC = os.path.join(os.path.dirname(selftest_goldens.__file__), "static")


def test_committed_goldens_match_generator():
    with open(os.path.join(STATIC, "selftest_goldens.json")) as fh:
        committed = json.load(fh)
    assert committed == json.loads(json.dumps(selftest_goldens.generate())), (
        "selftest_goldens.json is stale — regenerate with "
        "`python -m instageo_tpu.webapp.selftest_goldens`")


def test_selftest_page_imports_resolve():
    with open(os.path.join(STATIC, "selftest.html")) as fh:
        html = fh.read()
    for rel in re.findall(r'from "\./(js/[\w./]+)"', html):
        assert os.path.exists(os.path.join(STATIC, rel)), rel
    assert 'fetch("./selftest_goldens.json")' in html


def _js_lng_to_x(lng, z, tile=256):
    return ((lng + 180) / 360) * tile * (2 ** z)


def _js_lat_to_y(lat, z, tile=256):
    s = math.sin(lat * math.pi / 180)
    s = min(max(s, -0.9999), 0.9999)
    return (0.5 - math.log((1 + s) / (1 - s)) / (4 * math.pi)) * tile * (2 ** z)


def test_goldens_agree_with_spa_formulas():
    """Python twins of the SPA's mercator functions reproduce the goldens,
    so the in-browser comparison can only fail on a real JS regression."""
    g = selftest_goldens.generate()
    for s in g["latlng_to_pixel"]:
        assert _js_lng_to_x(s["lng"], s["z"]) == pytest.approx(
            s["px"], rel=1e-9, abs=1e-4)
        assert _js_lat_to_y(s["lat"], s["z"]) == pytest.approx(
            s["py"], rel=1e-7, abs=1e-3)
    for t in g["tile_corners"]:
        px, py = t["x"] * 256, t["y"] * 256
        # Invert the JS forms analytically.
        lng_nw = (px / (256 * 2 ** t["z"])) * 360 - 180
        assert lng_nw == pytest.approx(t["nw"][1], abs=1e-9)
        n = math.pi - (2 * math.pi * py) / (256 * 2 ** t["z"])
        lat_nw = (180 / math.pi) * math.atan(0.5 * (math.exp(n) - math.exp(-n)))
        assert lat_nw == pytest.approx(t["nw"][0], abs=1e-7)


def test_selftest_assets_served(tmp_path):
    """The aiohttp app serves the page, its goldens, and its modules."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from instageo_tpu.webapp.main import create_app

    async def run():
        app = create_app(db_path=str(tmp_path / "db.sqlite"))
        async with TestClient(TestServer(app)) as client:
            for path in ("/static/selftest.html",
                         "/static/selftest_goldens.json",
                         "/static/js/geomap.js",
                         "/static/js/segColors.js"):
                resp = await client.get(path)
                assert resp.status == 200, (path, resp.status)
            page = await (await client.get("/static/selftest.html")).text()
            assert "SPA selftest" in page

    asyncio.run(run())
