"""Regression tests for the round-2 self-review findings: top-level
run-model parameter overrides, tile access_token auth, /api/jobs
ownership filtering, malformed-colormap robustness, auth auto-disable."""

import asyncio
import importlib
import json
import os

import pytest

from aiohttp.test_utils import TestClient, TestServer


def _run(coro):
    return asyncio.get_event_loop_policy().new_event_loop() \
        .run_until_complete(coro)


def test_run_model_honors_top_level_overrides(tmp_path, monkeypatch):
    """The SPA (like the reference's) posts {bboxes, ...modelParams} with
    date/cloud_coverage/temporal_tolerance at the TOP level."""
    os.environ["TESTING"] = "true"
    from instageo_tpu.webapp.main import create_app
    from instageo_tpu.webapp.tasks import Task

    # Keep the task from actually enqueueing work.
    monkeypatch.setattr(Task, "start_data_processing", lambda self: "job")

    async def go():
        app = create_app(db_path=str(tmp_path / "t.sqlite"))
        async with TestClient(TestServer(app)) as client:
            resp = await client.post("/api/run-model", json={
                "bboxes": [[14.9, 42.9, 15.1, 43.1]],
                "model_key": "flood_mapping",
                "model_size": "base",
                "date": "2023-01-15",
                "temporal_tolerance": 12,
                "cloud_coverage": 20,
            })
            assert resp.status == 202, await resp.text()
            task_id = (await resp.json())["task_id"]
            task = await (await client.get(f"/api/task/{task_id}")).json()
            assert task["parameters"]["date"] == "2023-01-15"
            assert task["parameters"]["temporal_tolerance"] == 12
            assert task["parameters"]["cloud_coverage"] == 20
            # registry metadata still fills the rest
            assert task["parameters"]["chip_size"] == 224

    _run(go())


def test_titiler_accepts_access_token_query(tmp_path, monkeypatch):
    """Tile <img> requests can't carry headers; the token rides the query."""
    from instageo_tpu.webapp import main as main_mod
    from instageo_tpu.webapp.main import create_app

    monkeypatch.setattr(main_mod.settings, "AUTH_DISABLED", False)
    monkeypatch.setattr(
        main_mod, "get_current_user",
        lambda token: {"sub": "u1"} if token == "tok123" else
        (_ for _ in ()).throw(main_mod.AuthError("bad token")))

    async def go():
        app = create_app(db_path=str(tmp_path / "t.sqlite"))
        async with TestClient(TestServer(app)) as client:
            # no token -> 401
            r = await client.get("/api/titiler/t1/predictions/tiles/1/0/0.png")
            assert r.status == 401
            # query token -> authenticated (404: no such task COG, but
            # it got PAST auth)
            r = await client.get(
                "/api/titiler/t1/predictions/tiles/1/0/0.png"
                "?access_token=tok123")
            assert r.status == 404
            # query tokens are NOT accepted outside tile routes
            r = await client.get("/api/tasks?access_token=tok123")
            assert r.status == 401

    _run(go())


def test_jobs_listing_filtered_by_ownership(tmp_path, monkeypatch):
    from instageo_tpu.webapp import db, queue
    from instageo_tpu.webapp import main as main_mod
    from instageo_tpu.webapp.main import create_app

    db_path = str(tmp_path / "t.sqlite")
    db.init_db(db_path)
    # two tasks owned by different users, one job each
    for sub, tid in (("u1", "task-a"), ("u2", "task-b")):
        db.save_task({"task_id": tid, "user_sub": sub, "status": "completed",
                      "bboxes": [], "parameters": {}, "stages": {},
                      "model_key": "m", "model_size": "s", "error": None,
                      "created_at": 0}, db_path)
        queue.enqueue("data-processing", "x:y", {}, task_id=tid,
                      db_path=db_path)

    monkeypatch.setattr(main_mod.settings, "AUTH_DISABLED", False)
    monkeypatch.setattr(main_mod, "get_current_user",
                        lambda token: {"sub": token})

    async def go():
        app = create_app(db_path=db_path)
        async with TestClient(TestServer(app)) as client:
            r = await client.get("/api/jobs",
                                 headers={"Authorization": "Bearer u1"})
            jobs = (await r.json())["jobs"]
            assert [j["task_id"] for j in jobs] == ["task-a"]

    _run(go())


def test_malformed_colormap_falls_back_not_500(tmp_path):
    """Bad colormap query values must render with defaults, not crash."""
    import numpy as np

    from instageo_tpu.data.geotiff import Affine, write_geotiff
    from instageo_tpu.webapp.cog import COGConverter
    from instageo_tpu.webapp.main import create_app

    os.environ["TESTING"] = "true"
    task_dir = tmp_path / "tasks" / "t1"
    os.makedirs(task_dir / "predictions")
    pred = np.zeros((1, 64, 64), np.int8)
    pred[0, :32] = 1
    write_geotiff(str(task_dir / "predictions" / "prediction_0.tif"), pred,
                  transform=Affine.from_origin(500000, 4763000, 30, 30),
                  crs=32633, nodata=-1)
    COGConverter(str(task_dir), block_size=64,
                 num_overviews=1).merge_task_files_to_cog("t1")

    async def go():
        app = create_app(db_path=str(tmp_path / "t.sqlite"))
        app["tiler"].data_dir = str(tmp_path / "tasks")

        async with TestClient(TestServer(app)) as client:
            for cm in ("%5B1%2C2%5D",                       # JSON list
                       "%7B%220%22%3A%5B255%2C0%5D%7D",     # 2-length color
                       "notjson",
                       "%7B%22x%22%3A%5B1%2C2%2C3%5D%7D"):  # non-int key
                r = await client.get(
                    f"/api/titiler/t1/predictions/preview.png?mode=classes"
                    f"&colormap={cm}")
                assert r.status == 200, (cm, r.status, await r.text())
            # valid colormap still applies
            ok = json.dumps({"0": [1, 2, 3], "1": [255, 127, 14, 255]})
            from urllib.parse import quote
            r = await client.get(
                f"/api/titiler/t1/predictions/preview.png?mode=classes"
                f"&colormap={quote(ok)}")
            assert r.status == 200

    _run(go())


def test_auth_auto_disables_without_auth0(monkeypatch):
    import instageo_tpu.webapp.settings as settings_mod

    def fresh(env):
        for k in ("AUTH_DISABLED", "TESTING", "AUTH0_DOMAIN"):
            monkeypatch.delenv(k, raising=False)
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        return importlib.reload(settings_mod).BackendSettings()

    assert fresh({}).AUTH_DISABLED  # no tenant -> SPA sends no tokens
    assert not fresh({"AUTH0_DOMAIN": "t.auth0.com"}).AUTH_DISABLED
    assert fresh({"AUTH0_DOMAIN": "t.auth0.com",
                  "AUTH_DISABLED": "true"}).AUTH_DISABLED
    # hard-fail guard: explicit false keeps auth ON even with no tenant
    assert not fresh({"AUTH_DISABLED": "false"}).AUTH_DISABLED
    assert fresh({"TESTING": "true"}).AUTH_DISABLED
    # restore the test-suite default
    monkeypatch.setenv("TESTING", "true")
    importlib.reload(settings_mod)


def test_task_scoped_routes_enforce_ownership(tmp_path, monkeypatch):
    """visualize/tile/tilejson/preview/statistics 403 for non-owners —
    a task id leaking (shared link, logs) must not expose another
    user's imagery."""
    import numpy as np

    from instageo_tpu.data.geotiff import Affine, write_geotiff
    from instageo_tpu.webapp import db
    from instageo_tpu.webapp import main as main_mod
    from instageo_tpu.webapp.main import create_app

    db_path = str(tmp_path / "t.sqlite")
    db.init_db(db_path)
    db.save_task({"task_id": "task-a", "user_sub": "owner",
                  "status": "completed", "bboxes": [], "parameters": {},
                  "stages": {}, "model_key": "m", "model_size": "s",
                  "error": None, "created_at": 0}, db_path)
    cog_dir = tmp_path / "tasks" / "task-a"
    cog_dir.mkdir(parents=True)
    write_geotiff(str(cog_dir / "task-a_predictions.tif"),
                  np.zeros((1, 8, 8), np.int8),
                  transform=Affine.from_origin(0, 1, 0.1, 0.1), crs=4326)

    monkeypatch.setattr(main_mod.settings, "AUTH_DISABLED", False)
    monkeypatch.setattr(main_mod.settings, "TASKS_DATA_DIR",
                        str(tmp_path / "tasks"))
    monkeypatch.setattr(main_mod, "get_current_user",
                        lambda token: {"sub": token})

    async def go():
        app = create_app(db_path=db_path)
        async with TestClient(TestServer(app)) as client:
            routes = [
                "/api/visualize/task-a",
                "/api/titiler/task-a/predictions/tiles/1/0/0.png",
                "/api/titiler/task-a/predictions/tilejson.json",
                "/api/titiler/task-a/predictions/preview.png",
                "/api/titiler/task-a/predictions/statistics",
            ]
            for path in routes:
                r = await client.get(
                    path, headers={"Authorization": "Bearer intruder"})
                assert r.status == 403, (path, r.status)
                r = await client.get(
                    path, headers={"Authorization": "Bearer owner"})
                assert r.status == 200, (path, r.status, await r.text())

    _run(go())


def test_expired_inflight_tasks_purged(tmp_path):
    """The TTL reaper removes expired NON-terminal tasks and their jobs;
    terminal tasks persist (reference Redis-TTL vs DB semantics)."""
    import time as _time

    from instageo_tpu.webapp import db, queue

    db_path = str(tmp_path / "t.sqlite")
    db.init_db(db_path)
    now = _time.time()
    for tid, status, exp in (
            ("stale-running", "data_processing", now - 10),
            ("fresh-running", "data_processing", now + 3600),
            ("old-completed", "completed", now - 10)):
        db.save_task({"task_id": tid, "user_sub": "u", "status": status,
                      "bboxes": [], "parameters": {}, "stages": {},
                      "model_key": "m", "model_size": "s", "error": None,
                      "created_at": now - 100, "expires_at": exp}, db_path)
        queue.enqueue("data-processing", "x:y", {}, task_id=tid,
                      db_path=db_path)

    assert queue.reap_expired_tasks(db_path) == 1
    conn = db.get_conn(db_path)
    left = {r["task_id"] for r in
            conn.execute("SELECT task_id FROM tasks").fetchall()}
    assert left == {"fresh-running", "old-completed"}
    jobs = {r["task_id"] for r in
            conn.execute("SELECT task_id FROM jobs").fetchall()}
    assert "stale-running" not in jobs


def test_run_model_rejects_unknown_size(tmp_path, monkeypatch):
    import yaml

    reg = tmp_path / "registry.yaml"
    reg.write_text(yaml.safe_dump({"models": {
        "m1": {"name": "M1", "sizes": {"small": {}, "base": {}}}}}))
    monkeypatch.setenv("MODELS_REGISTRY_PATH", str(reg))

    from instageo_tpu.webapp.main import create_app

    async def go():
        app = create_app(db_path=str(tmp_path / "t.sqlite"))
        async with TestClient(TestServer(app)) as client:
            r = await client.post("/api/run-model", json={
                "bboxes": [[0, 0, 1, 1]], "model_key": "m1",
                "model_size": "huge"})
            assert r.status == 422
            assert "huge" in (await r.json())["detail"]

    _run(go())


def test_task_update_refreshes_expiry(tmp_path, monkeypatch):
    """Every save refreshes expires_at (the reference resets its Redis
    TTL per write): a slow-but-progressing task must not be purged."""
    import time as _time

    from instageo_tpu.webapp import db, queue

    db_path = str(tmp_path / "t.sqlite")
    db.init_db(db_path)
    base = {"task_id": "slow", "user_sub": "u", "bboxes": [],
            "parameters": {}, "stages": {}, "model_key": "m",
            "model_size": "s", "error": None}
    now = _time.time()
    # Created long ago (stale expiry)...
    db.save_task({**base, "status": "pending", "created_at": now - 100,
                  "expires_at": now - 10}, db_path)
    # ...but a progress write lands now: the UPDATE must refresh expiry
    # (the INSERT..ON CONFLICT clause once dropped the new expires_at).
    db.save_task({**base, "status": "model_prediction",
                  "created_at": now - 100}, db_path)
    assert queue.reap_expired_tasks(db_path) == 0
    conn = db.get_conn(db_path)
    row = conn.execute("SELECT expires_at, status FROM tasks "
                       "WHERE task_id='slow'").fetchone()
    assert row["status"] == "model_prediction"
    assert row["expires_at"] > now  # refreshed, not the stale value
