"""Web backend API tests: full task lifecycle through the REST surface.

Drives the real aiohttp app with the real stage workers (drained
synchronously) against a mocked STAC search and a trained tiny model —
the reference only exercises this path with patched task functions
(backend/tests/test_api.py); here the whole three-stage machine runs.
"""

import asyncio
import json
import os

import numpy as np
import pandas as pd
import pytest
import yaml

from aiohttp.test_utils import TestClient, TestServer

from instageo_tpu.data.crs import latlon_to_utm, utm_to_latlon
from instageo_tpu.data.geotiff import Affine, write_geotiff
from instageo_tpu.data.stac import StacClient, StacItem

TILE = 96
CHIP = 32
RES = 30.0


def _run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """Granule files + registry with a trained tiny model + env wiring."""
    root = tmp_path_factory.mktemp("webapp")

    # --- granule band files over a known location -------------------------
    lat0, lon0 = 43.0, 15.0
    e0, n0, zone, south = latlon_to_utm(lat0, lon0)
    origin_x = float(e0) - (TILE / 2) * RES
    origin_y = float(n0) + (TILE / 2) * RES
    transform = Affine.from_origin(origin_x, origin_y, RES, RES)
    rng = np.random.default_rng(0)
    assets = {}
    for i, b in enumerate(["B02", "B03", "B04", "B8A", "B11", "B12"]):
        arr = rng.integers(100, 5000, size=(TILE, TILE)).astype(np.uint16)
        p = str(root / f"granule_{b}.tif")
        write_geotiff(p, arr[None], transform=transform, crs=32633, nodata=0)
        assets[b] = p
    fmask = np.zeros((TILE, TILE), np.uint16)
    pm = str(root / "granule_Fmask.tif")
    write_geotiff(pm, fmask[None], transform=transform, crs=32633)
    assets["Fmask"] = pm

    lat_a, lon_a = utm_to_latlon(origin_x, origin_y - TILE * RES, zone, south)
    lat_b, lon_b = utm_to_latlon(origin_x + TILE * RES, origin_y, zone, south)
    item = StacItem(
        id="HLS.S30.T33TUN.2024151T100000.v2.0", collection="HLSS30_2.0",
        bbox=(float(lon_a), float(lat_a), float(lon_b), float(lat_b)),
        datetime=pd.Timestamp("2024-05-30T10:00:00", tz="UTC"),
        properties={"eo:cloud_cover": 2}, assets=assets)

    # --- registry: tiny trained model -------------------------------------
    models_path = root / "models"
    run_dir = models_path / "toy_model" / "base"
    os.makedirs(run_dir, exist_ok=True)
    chips_dir = root / "trainchips"
    os.makedirs(chips_dir, exist_ok=True)
    rows = []
    for i in range(4):
        arr = rng.integers(1, 10000, size=(6, CHIP, CHIP)).astype(np.uint16)
        lab = rng.integers(0, 2, size=(CHIP, CHIP)).astype(np.int16)
        tr = Affine.from_origin(499980 + i * 960, 4100040, 30, 30)
        write_geotiff(str(chips_dir / f"chip_{i}.tif"), arr, transform=tr,
                      crs=32633, nodata=0)
        write_geotiff(str(chips_dir / f"seg_map_{i}.tif"), lab[None],
                      transform=tr, crs=32633, nodata=-1)
        rows.append({"Input": f"chip_{i}.tif", "Label": f"seg_map_{i}.tif"})
    pd.DataFrame(rows).to_csv(chips_dir / "data.csv", index=False)

    from instageo_tpu.train.run import main as run_main
    run_main([
        "mode=train", f"root_dir={chips_dir}",
        f"train_filepath={chips_dir / 'data.csv'}",
        f"valid_filepath={chips_dir / 'data.csv'}", f"run_dir={run_dir}",
        "model.model_name=prithvi_eo_tiny", "model.load_pretrained_weights=False",
        f"dataloader.img_size={CHIP}", "dataloader.bands=[0,1,2,3,4,5]",
        "dataloader.mean=[3000,3000,3000,3000,3000,3000]",
        "dataloader.std=[2000,2000,2000,2000,2000,2000]",
        "dataloader.no_data_value=0", "train.ignore_index=-1",
        "train.batch_size=4", "train.num_epochs=1",
        f"test.img_size={CHIP}", f"test.crop_size={CHIP}", f"test.stride={CHIP}",
        "tpu.precision=f32",
    ])

    registry_yaml = root / "models_registry.yaml"
    with open(registry_yaml, "w") as f:
        yaml.safe_dump({"models": {"toy_model": {
            "name": "Toy", "description": "tiny test model",
            "data_source": "HLS", "chip_size": CHIP, "num_steps": 1,
            "default_size": "base", "sizes": {"base": {}},
        }}}, f)

    bbox = [float(lon_a) + 0.001, float(lat_a) + 0.001,
            float(lon_b) - 0.001, float(lat_b) - 0.001]
    return {"root": root, "item": item, "registry_yaml": registry_yaml,
            "models_path": models_path, "bbox": bbox}


@pytest.fixture
def app(world, tmp_path, monkeypatch):
    monkeypatch.setenv("MODELS_REGISTRY_PATH", str(world["registry_yaml"]))
    monkeypatch.setenv("MODELS_PATH", str(world["models_path"]))
    monkeypatch.setattr(StacClient, "search",
                        lambda self, **kw: [world["item"]], raising=True)
    # Fresh settings bound to tmp dirs.
    from instageo_tpu.webapp import settings as settings_mod
    monkeypatch.setattr(settings_mod.settings, "TASKS_DATA_DIR",
                        str(tmp_path / "tasks"))
    monkeypatch.setattr(settings_mod.settings, "DATABASE_URL",
                        str(tmp_path / "db.sqlite"))
    monkeypatch.setattr(settings_mod.settings, "AUTH_DISABLED", True)

    from instageo_tpu.webapp.main import create_app
    return create_app(db_path=str(tmp_path / "db.sqlite"))


def test_health_and_models(app):
    async def go():
        async with TestClient(TestServer(app)) as client:
            r = await client.get("/api/health")
            assert r.status == 200
            body = await r.json()
            assert body["database"] == "ok"

            r = await client.get("/api/models")
            models = (await r.json())["models"]
            assert models[0]["model_key"] == "toy_model"

            r = await client.get("/api/models/toy_model")
            assert r.status == 200
            r = await client.get("/api/models/nope")
            assert r.status == 404
    _run(go())


def test_run_model_validation(app):
    async def go():
        async with TestClient(TestServer(app)) as client:
            r = await client.post("/api/run-model", json={})
            assert r.status == 422
            r = await client.post("/api/run-model",
                                  json={"bboxes": [[0, 0, 1, 1]]})
            assert r.status == 422
            r = await client.post("/api/run-model", json={
                "bboxes": [[0, 0, 1, 1]], "model_key": "missing"})
            assert r.status == 404
    _run(go())


def test_full_task_lifecycle(app, world):
    """POST run-model -> drain workers -> completed -> visualize/tiles."""
    from instageo_tpu.webapp import queue as q

    async def lifecycle():
        async with TestClient(TestServer(app)) as client:
            r = await client.post("/api/run-model", json={
                "bboxes": [world["bbox"]], "model_key": "toy_model",
                "parameters": {"date": "2024-06-01"},
            })
            assert r.status == 202
            body = await r.json()
            task_id = body["task_id"]

            # Drain the three stage queues (workers would do this).
            loop = asyncio.get_event_loop()
            processed = await loop.run_in_executor(
                None, lambda: q.drain(db_path=app["db_path"]))
            assert processed >= 3

            r = await client.get(f"/api/task/{task_id}")
            task = await r.json()
            assert task["status"] == "completed", task
            for stage in task["stages"].values():
                assert stage["status"] == "completed"

            r = await client.get("/api/tasks")
            assert any(t["task_id"] == task_id
                       for t in (await r.json())["tasks"])

            r = await client.get("/api/queues/status")
            status = await r.json()
            assert status["data-processing"]["finished"] >= 1

            r = await client.get(f"/api/visualize/{task_id}")
            assert r.status == 200
            layers = (await r.json())["layers"]
            assert "chips" in layers and "predictions" in layers

            # TileJSON + a tile + preview + statistics
            r = await client.get(
                f"/api/titiler/{task_id}/predictions/tilejson.json")
            tj = await r.json()
            assert tj["tilejson"] == "2.2.0"
            lon = (tj["bounds"][0] + tj["bounds"][2]) / 2
            lat = (tj["bounds"][1] + tj["bounds"][3]) / 2
            z = 12
            import math
            xt = int((lon + 180) / 360 * 2 ** z)
            yt = int((1 - math.asinh(math.tan(math.radians(lat))) / math.pi)
                     / 2 * 2 ** z)
            r = await client.get(
                f"/api/titiler/{task_id}/predictions/tiles/{z}/{xt}/{yt}.png")
            assert r.status == 200
            assert r.content_type == "image/png"
            png = await r.read()
            assert png[:8] == b"\x89PNG\r\n\x1a\n"

            r = await client.get(
                f"/api/titiler/{task_id}/chips/preview.png")
            assert r.status == 200

            r = await client.get(
                f"/api/titiler/{task_id}/chips/statistics")
            stats = await r.json()
            assert "b1" in stats

    _run(lifecycle())


def test_task_not_found_and_incomplete_visualize(app):
    async def go():
        async with TestClient(TestServer(app)) as client:
            r = await client.get("/api/task/nonexistent")
            assert r.status == 404
            r = await client.get("/api/visualize/nonexistent")
            assert r.status == 404
    _run(go())
