"""Persistence: sqlite3 users/tasks/jobs store.

Replaces the reference's SQLAlchemy + Redis split (``instageo/new_apps/
backend/app/{models,db,crud,redis_client}.py``) with one sqlite database:
tasks and their stages live in the ``tasks`` table (the reference keeps
in-progress state in Redis hashes and persists to Postgres on completion);
the job queue is a table with atomic claim semantics (see queue.py). WAL
mode makes concurrent worker processes safe.
"""

from __future__ import annotations

import json
import sqlite3
import threading
import time
from typing import Any, Dict, List, Optional

from instageo_tpu.webapp.settings import settings

_SCHEMA = """
CREATE TABLE IF NOT EXISTS users (
    sub TEXT PRIMARY KEY,
    email TEXT,
    name TEXT,
    created_at REAL
);
CREATE TABLE IF NOT EXISTS tasks (
    task_id TEXT PRIMARY KEY,
    user_sub TEXT,
    status TEXT,
    bboxes TEXT,
    parameters TEXT,
    stages TEXT,
    model_key TEXT,
    model_size TEXT,
    error TEXT,
    created_at REAL,
    updated_at REAL,
    expires_at REAL
);
CREATE TABLE IF NOT EXISTS jobs (
    job_id TEXT PRIMARY KEY,
    queue TEXT,
    task_id TEXT,
    func TEXT,
    args TEXT,
    status TEXT,
    timeout_s REAL,
    enqueued_at REAL,
    started_at REAL,
    finished_at REAL,
    result TEXT,
    error TEXT
);
CREATE INDEX IF NOT EXISTS idx_jobs_queue_status ON jobs(queue, status);
CREATE INDEX IF NOT EXISTS idx_tasks_user ON tasks(user_sub);
CREATE TABLE IF NOT EXISTS dead_letters (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    payload TEXT,
    error TEXT,
    created_at REAL
);
"""

_local = threading.local()


def get_conn(db_path: Optional[str] = None) -> sqlite3.Connection:
    """Per-thread connection with WAL + row factory."""
    path = db_path or settings.DATABASE_URL
    key = f"conn_{path}"
    conn = getattr(_local, key, None)
    if conn is None:
        conn = sqlite3.connect(path, timeout=30.0)
        conn.row_factory = sqlite3.Row
        conn.execute("PRAGMA journal_mode=WAL")
        conn.execute("PRAGMA busy_timeout=30000")
        conn.executescript(_SCHEMA)
        conn.commit()
        setattr(_local, key, conn)
    return conn


def init_db(db_path: Optional[str] = None) -> None:
    get_conn(db_path)


def reset_local_conns() -> None:
    """Drop cached per-thread connections (call in a freshly forked child —
    sqlite connections must not be shared across fork)."""
    for key in list(vars(_local)):
        delattr(_local, key)


# -- users -------------------------------------------------------------------


def upsert_user(sub: str, email: str = "", name: str = "",
                db_path: Optional[str] = None) -> None:
    conn = get_conn(db_path)
    conn.execute(
        "INSERT INTO users(sub, email, name, created_at) VALUES(?,?,?,?) "
        "ON CONFLICT(sub) DO UPDATE SET email=excluded.email, name=excluded.name",
        (sub, email, name, time.time()))
    conn.commit()


# -- tasks -------------------------------------------------------------------


def save_task(task: Dict[str, Any], db_path: Optional[str] = None) -> None:
    conn = get_conn(db_path)
    now = time.time()
    conn.execute(
        """INSERT INTO tasks(task_id, user_sub, status, bboxes, parameters,
               stages, model_key, model_size, error, created_at, updated_at,
               expires_at)
           VALUES(?,?,?,?,?,?,?,?,?,?,?,?)
           ON CONFLICT(task_id) DO UPDATE SET
               status=excluded.status, stages=excluded.stages,
               error=excluded.error, updated_at=excluded.updated_at""",
        (
            task["task_id"], task.get("user_sub"), task.get("status"),
            json.dumps(task.get("bboxes")), json.dumps(task.get("parameters")),
            json.dumps(task.get("stages")), task.get("model_key"),
            task.get("model_size"), task.get("error"),
            task.get("created_at", now), now,
            task.get("created_at", now) + settings.TASK_TTL,
        ))
    conn.commit()


def _row_to_task(row: sqlite3.Row) -> Dict[str, Any]:
    d = dict(row)
    for key in ("bboxes", "parameters", "stages"):
        if d.get(key):
            d[key] = json.loads(d[key])
    return d


def load_task(task_id: str, db_path: Optional[str] = None) -> Optional[Dict]:
    row = get_conn(db_path).execute(
        "SELECT * FROM tasks WHERE task_id=?", (task_id,)).fetchone()
    return _row_to_task(row) if row else None


def list_tasks(user_sub: Optional[str] = None, limit: int = 100,
               db_path: Optional[str] = None) -> List[Dict]:
    conn = get_conn(db_path)
    if user_sub:
        rows = conn.execute(
            "SELECT * FROM tasks WHERE user_sub=? ORDER BY created_at DESC "
            "LIMIT ?", (user_sub, limit)).fetchall()
    else:
        rows = conn.execute(
            "SELECT * FROM tasks ORDER BY created_at DESC LIMIT ?",
            (limit,)).fetchall()
    return [_row_to_task(r) for r in rows]


def dead_letter(payload: Dict, error: str, db_path: Optional[str] = None) -> None:
    """Persistence-failure fallback store (reference redis_client.py:282-395)."""
    conn = get_conn(db_path)
    conn.execute("INSERT INTO dead_letters(payload, error, created_at) "
                 "VALUES(?,?,?)", (json.dumps(payload), error, time.time()))
    conn.commit()
