"""Download helpers + local granule loading tests (network mocked)."""

import io
import os
import zipfile

import numpy as np
import pytest

from instageo_tpu.data.downloads import (
    S2AuthState,
    open_mf_jp2_dataset,
    open_mf_tiff_dataset,
    parallel_download,
)
from instageo_tpu.data.geotiff import Affine, write_geotiff


def test_open_mf_tiff_dataset(tmp_path):
    rng = np.random.default_rng(0)
    tiles = {}
    masks = {}
    for i, name in enumerate(["B02_0", "B03_0", "B02_1", "B03_1"]):
        arr = rng.integers(0, 10000, size=(16, 16)).astype(np.uint16)
        p = str(tmp_path / f"{name}.tif")
        write_geotiff(p, arr[None],
                      transform=Affine.from_origin(0, 0, 30, 30), crs=32633)
        tiles[name] = p
    for name in ["Fmask_0", "Fmask_1"]:
        p = str(tmp_path / f"{name}.tif")
        write_geotiff(p, np.zeros((1, 16, 16), np.uint16))
        masks[name] = p
    bands, m, transform, crs = open_mf_tiff_dataset(
        {"tiles": tiles, "fmasks": masks}, load_masks=True)
    assert bands.shape == (4, 16, 16)
    assert m.shape == (2, 16, 16)
    assert crs == 32633 and transform.a == 30.0


def test_parallel_download_mocked(tmp_path, monkeypatch):
    import requests

    payload = b"x" * 4096

    class FakeResp:
        status_code = 200
        def raise_for_status(self): pass
        def iter_content(self, n): yield payload
        def __enter__(self): return self
        def __exit__(self, *a): pass

    gets = {"n": 0}

    def fake_get(*a, **k):
        gets["n"] += 1
        return FakeResp()

    monkeypatch.setattr(requests, "get", fake_get)
    out = parallel_download({"a.tif": "http://x/a", "b.tif": "http://x/b"},
                            str(tmp_path))
    assert len(out) == 2
    assert gets["n"] == 2
    assert os.path.getsize(tmp_path / "a.tif") == 4096
    # Second call SKIPS existing valid files — no new HTTP request (the
    # resume contract that matters on a ~15 MB/s relay link).
    out2 = parallel_download({"a.tif": "http://x/a"}, str(tmp_path))
    assert len(out2) == 1
    assert gets["n"] == 2


def test_s2_auth_state_token_flow(monkeypatch):
    import requests

    calls = {}

    class FakeResp:
        status_code = 200
        def json(self):
            return {"access_token": "tok123", "refresh_token": "ref456"}

    class FakeSession:
        def post(self, url, data=None, timeout=None):
            calls["data"] = data
            return FakeResp()

    auth = S2AuthState(username="u", password="p")
    token = auth.get_token(FakeSession())
    assert token == "tok123"
    assert calls["data"]["grant_type"] == "password"
    # refresh path on second call
    auth.get_token(FakeSession())
    assert calls["data"]["grant_type"] == "refresh_token"
    assert auth.headers()["Authorization"] == "Bearer tok123"


def test_open_mf_jp2_dataset(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    files = {}
    for b in ("B02", "B03"):
        arr = rng.integers(0, 1000, size=(256, 256)).astype(np.uint16)
        p = str(tmp_path / f"{b}.jp2")
        assert cv2.imwrite(p, arr)
        files[b] = p
    bands, scl = open_mf_jp2_dataset(files)
    assert bands.shape == (2, 256, 256)
    assert scl is None
