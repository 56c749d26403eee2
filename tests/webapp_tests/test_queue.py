"""Queue unit tests: claims, failures, timeouts, status."""

import time

import pytest

from instageo_tpu.webapp import db, queue


@pytest.fixture
def qdb(tmp_path):
    path = str(tmp_path / "q.sqlite")
    db.init_db(path)
    return path


def _ok_job(**kwargs):
    return {"value": kwargs.get("value", 1)}


def _boom():
    raise RuntimeError("boom")


def test_enqueue_claim_run(qdb):
    jid = queue.enqueue("data-processing",
                        "tests.webapp_tests.test_queue:_ok_job",
                        {"value": 7}, db_path=qdb)
    job = queue.claim_next("data-processing", db_path=qdb)
    assert job["job_id"] == jid
    # claimed jobs can't be double-claimed
    assert queue.claim_next("data-processing", db_path=qdb) is None
    assert queue.run_job(job, db_path=qdb)
    rec = queue.get_job(jid, db_path=qdb)
    assert rec["status"] == "finished"
    assert "7" in rec["result"]


def test_failed_job_records_error(qdb):
    queue.enqueue("data-processing", "tests.webapp_tests.test_queue:_boom",
                  {}, db_path=qdb)
    assert queue.work_once("data-processing", db_path=qdb)
    status = queue.get_queues_status(qdb)
    assert status["data-processing"]["failed"] == 1


def test_reap_timeouts(qdb):
    jid = queue.enqueue("model-prediction",
                        "tests.webapp_tests.test_queue:_ok_job", {},
                        timeout_s=0.01, db_path=qdb)
    job = queue.claim_next("model-prediction", db_path=qdb)
    assert job is not None
    time.sleep(0.05)
    assert queue.reap_timeouts(qdb) == 1
    assert queue.get_job(jid, db_path=qdb)["status"] == "timed_out"


def _hang():
    time.sleep(600)


def test_isolated_hung_job_is_killed(qdb):
    """A hung job must not wedge its queue: the work-horse child is killed
    at timeout_s and the worker can keep consuming (ADVICE round-1)."""
    jid = queue.enqueue("model-prediction",
                        "tests.webapp_tests.test_queue:_hang", {},
                        timeout_s=0.5, db_path=qdb)
    queue.enqueue("model-prediction",
                  "tests.webapp_tests.test_queue:_ok_job", {"value": 3},
                  db_path=qdb)
    t0 = time.monotonic()
    assert queue.work_once("model-prediction", db_path=qdb, isolate=True)
    assert time.monotonic() - t0 < 30  # killed, not slept out
    assert queue.get_job(jid, db_path=qdb)["status"] == "timed_out"
    # the queue is NOT wedged: the next job still runs
    assert queue.work_once("model-prediction", db_path=qdb, isolate=True)
    status = queue.get_queues_status(qdb)
    assert status["model-prediction"]["finished"] == 1


def test_isolated_job_success(qdb):
    jid = queue.enqueue("data-processing",
                        "tests.webapp_tests.test_queue:_ok_job",
                        {"value": 9}, db_path=qdb)
    job = queue.claim_next("data-processing", db_path=qdb)
    assert queue.run_job_isolated(job, db_path=qdb)
    rec = queue.get_job(jid, db_path=qdb)
    assert rec["status"] == "finished" and "9" in rec["result"]


def test_drain_processes_chained_jobs(qdb):
    queue.enqueue("data-processing", "tests.webapp_tests.test_queue:_ok_job",
                  {}, db_path=qdb)
    queue.enqueue("visualization-preparation",
                  "tests.webapp_tests.test_queue:_ok_job", {}, db_path=qdb)
    assert queue.drain(db_path=qdb) == 2
    assert queue.drain(db_path=qdb) == 0


def test_list_jobs_for_dashboard(qdb):
    """/api/jobs backing store: newest-first listing with filters
    (rq-dashboard equivalent)."""
    queue.enqueue("data-processing", "tests.webapp_tests.test_queue:_ok_job",
                  {}, db_path=qdb)
    time.sleep(0.01)
    queue.enqueue("model-prediction", "tests.webapp_tests.test_queue:_boom",
                  {}, db_path=qdb)
    queue.drain(db_path=qdb)
    jobs = queue.list_jobs(db_path=qdb)
    assert len(jobs) == 2
    assert jobs[0]["queue"] == "model-prediction"  # newest first
    failed = queue.list_jobs(status="failed", db_path=qdb)
    assert len(failed) == 1 and failed[0]["queue"] == "model-prediction"
    dp = queue.list_jobs(queue_name="data-processing", db_path=qdb)
    assert len(dp) == 1 and dp[0]["status"] == "finished"
