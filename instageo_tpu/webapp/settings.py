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
    # SPA client id, injected into index.html (reference frontend/.env
    # REACT_APP_AUTH0_CLIENT_ID consumed by auth0-config.js).
    AUTH0_CLIENT_ID: str = os.environ.get("AUTH0_CLIENT_ID", "")
    # Optional absolute API base for the SPA when the API is served from a
    # different origin than the static files (reference REACT_APP_API_URL).
    API_BASE_URL: str = os.environ.get("API_BASE_URL", "")
    DATABASE_URL: str = os.environ.get("DATABASE_URL", "data/backend.sqlite")
    TASK_TTL: int = int(os.environ.get("REDIS_TTL", 24 * 3600))
    TASKS_DATA_DIR: str = os.environ.get("TASKS_DATA_DIR", "data/tasks")
    MODELS_PATH: str = os.environ.get("MODELS_PATH", "models")
    # Auth is active only when an Auth0 tenant is configured — matching
    # the SPA, which sends no tokens when window.INSTAGEO_AUTH0 is empty
    # (the reference's frontend auth0-config.js behaves the same way).
    # AUTH_DISABLED=true / TESTING=true force it off; AUTH_DISABLED=false
    # forces it ON even without a domain (hard-fail deployment guard).
    AUTH_DISABLED: bool = (
        os.environ.get("AUTH_DISABLED",
                       os.environ.get("TESTING", "")).lower() == "true"
        or (os.environ.get("AUTH_DISABLED", "").lower() != "false"
            and not os.environ.get("AUTH0_DOMAIN", ""))
    )

    def __init__(self, **kw) -> None:
        super().__init__(**kw)
        # Auto-create the sqlite directory (reference settings.py does the
        # same); URL-style DSNs (postgresql://...) are not paths.
        if "://" not in self.DATABASE_URL:
            db_dir = os.path.dirname(self.DATABASE_URL)
            if db_dir:
                os.makedirs(db_dir, exist_ok=True)


settings = BackendSettings()
