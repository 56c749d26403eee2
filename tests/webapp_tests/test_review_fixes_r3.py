"""Round-3 webapp review fixes: body-shape validation, limit parsing,
timed_out visibility, gray render mode, whole-image previews, worker
child termination, and user-row enrichment semantics."""

import asyncio
import time

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer


def _run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


@pytest.fixture
def app(tmp_path, monkeypatch):
    from instageo_tpu.webapp import settings as settings_mod

    monkeypatch.setattr(settings_mod.settings, "TASKS_DATA_DIR",
                        str(tmp_path / "tasks"))
    monkeypatch.setattr(settings_mod.settings, "DATABASE_URL",
                        str(tmp_path / "db.sqlite"))
    monkeypatch.setattr(settings_mod.settings, "AUTH_DISABLED", True)
    from instageo_tpu.webapp.main import create_app

    return create_app(db_path=str(tmp_path / "db.sqlite"))


def test_run_model_rejects_wrong_shape_bodies(app):
    async def go():
        async with TestClient(TestServer(app)) as client:
            # Valid JSON, wrong shapes: 4xx, never a 500.
            r = await client.post("/api/run-model", json=[1, 2, 3])
            assert r.status == 422
            r = await client.post("/api/run-model", json={
                "bboxes": [[0, 0, 1, 1]], "model_key": "x",
                "parameters": "oops"})
            assert r.status == 422
    _run(go())


def test_list_jobs_rejects_non_integer_limit(app):
    async def go():
        async with TestClient(TestServer(app)) as client:
            r = await client.get("/api/jobs?limit=abc")
            assert r.status == 422
    _run(go())


def test_queues_status_counts_timed_out(tmp_path):
    from instageo_tpu.webapp import queue

    db_path = str(tmp_path / "q.sqlite")
    job_id = queue.enqueue(queue.QUEUE_DATA_PROCESSING, "os.getcwd", {},
                           db_path=db_path)
    conn_status = queue.get_queues_status(db_path)
    assert "timed_out" in conn_status[queue.QUEUE_DATA_PROCESSING]
    # Force the job into timed_out and verify it is counted.
    from instageo_tpu.webapp import db as wdb

    conn = wdb.get_conn(db_path)
    conn.execute("UPDATE jobs SET status='timed_out' WHERE job_id=?",
                 (job_id,))
    conn.commit()
    status = queue.get_queues_status(db_path)
    assert status[queue.QUEUE_DATA_PROCESSING]["timed_out"] == 1


def test_terminate_current_child_kills_job_process(tmp_path):
    """The worker SIGTERM path must kill the in-flight job child (orphaned
    children would keep running — and using the TPU — after shutdown)."""
    from instageo_tpu.webapp import queue

    db_path = str(tmp_path / "q.sqlite")
    job_id = queue.enqueue(queue.QUEUE_MODEL_PREDICTION, "time.sleep", {},
                           db_path=db_path)
    claimed = queue.claim_next(queue.QUEUE_MODEL_PREDICTION, db_path)
    assert claimed is not None
    child = queue._mp.Process(target=time.sleep, args=(60,))
    child.start()
    queue._current_child, queue._current_job = child, claimed
    try:
        queue._terminate_current_child(db_path)
        child.join(10.0)
        assert not child.is_alive()
        row = queue.get_job(job_id, db_path)
        assert row["status"] == queue.JobStatus.FAILED
        assert "shutdown" in (row.get("error") or "")
    finally:
        queue._current_child = queue._current_job = None
        if child.is_alive():
            child.kill()


def test_tiler_gray_mode_and_whole_image_preview(tmp_path):
    """'gray' renders band 1 as grayscale (documented in the OpenAPI spec)
    and preview() decimates the WHOLE level — a large single-level TIFF
    must not come back as its top-left corner."""
    from instageo_tpu.data.geotiff import Affine, write_geotiff
    from instageo_tpu.webapp.tiler import COGTiler

    # Quadrant-valued single-band image, larger than max_size*4.
    size = 1200
    data = np.zeros((1, size, size), np.uint16)
    data[:, size // 2:, :] = 2000   # bottom half bright
    data[:, :, size // 2:] += 1000  # right half brighter
    path = tmp_path / "big.tif"
    write_geotiff(str(path), data,
                  transform=Affine.from_origin(10.0, 45.0, 0.001, 0.001),
                  crs=4326)

    tiler = COGTiler(str(path))
    png = tiler.preview(max_size=256, mode="gray", value_range=(0, 3000))
    from PIL import Image
    import io

    img = np.asarray(Image.open(io.BytesIO(png)))
    h, w = img.shape[:2]
    assert max(h, w) <= 256
    # All four quadrants present: distinct means per quadrant.
    q = [img[:h // 2, :w // 2, 0].mean(), img[:h // 2, w // 2:, 0].mean(),
         img[h // 2:, :w // 2, 0].mean(), img[h // 2:, w // 2:, 0].mean()]
    assert len({round(v / 20) for v in q}) >= 3, q
    # Grayscale: R == G == B.
    assert (img[..., 0] == img[..., 1]).all()
    assert (img[..., 0] == img[..., 2]).all()


def test_upsert_user_preserves_enriched_fields(tmp_path):
    from instageo_tpu.webapp import db

    db_path = str(tmp_path / "u.sqlite")
    db.upsert_user("sub1", "a@b.c", "Ada", db_path=db_path)
    # A later claims-only upsert (no email in the access token) must not
    # erase the enriched profile.
    db.upsert_user("sub1", "", "", db_path=db_path)
    row = db.get_user("sub1", db_path=db_path)
    assert row["email"] == "a@b.c" and row["name"] == "Ada"
    assert db.get_user("nope", db_path=db_path) is None
