"""Web backend settings (env-overridable).

Reference: ``instageo/new_apps/backend/app/settings.py`` — Auth0 domain/
audience, database URL (sqlite dir auto-created), task TTL.
"""

from __future__ import annotations

import os
from pydantic import BaseModel


class BackendSettings(BaseModel):
    AUTH0_DOMAIN: str = os.environ.get("AUTH0_DOMAIN", "")
    AUTH0_AUDIENCE: str = os.environ.get("AUTH0_AUDIENCE", "")
    DATABASE_URL: str = os.environ.get("DATABASE_URL", "data/backend.sqlite")
    TASK_TTL: int = int(os.environ.get("REDIS_TTL", 24 * 3600))
    TASKS_DATA_DIR: str = os.environ.get("TASKS_DATA_DIR", "data/tasks")
    MODELS_PATH: str = os.environ.get("MODELS_PATH", "models")
    AUTH_DISABLED: bool = os.environ.get(
        "AUTH_DISABLED", os.environ.get("TESTING", "")
    ).lower() == "true"

    def __init__(self, **kw) -> None:
        super().__init__(**kw)
        db_dir = os.path.dirname(self.DATABASE_URL)
        if db_dir:
            os.makedirs(db_dir, exist_ok=True)


settings = BackendSettings()
