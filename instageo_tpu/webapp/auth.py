"""Auth0 JWT verification (RS256) without python-jose.

Reference: ``instageo/new_apps/backend/app/auth.py`` — JWKS fetch with
caching, RS256 signature verification, audience/issuer validation, task
ownership checks, and /userinfo retrieval with retry. Signature math uses
the ``cryptography`` package directly.
"""

from __future__ import annotations

import base64
import json
import logging
import time
from typing import Any, Dict, Optional

import requests
from cryptography.hazmat.primitives import hashes
from cryptography.hazmat.primitives.asymmetric import padding, rsa

from instageo_tpu.utils.ratelimit import retry_backoff
from instageo_tpu.webapp.settings import settings

log = logging.getLogger(__name__)


class AuthError(Exception):
    def __init__(self, message: str, status: int = 401) -> None:
        super().__init__(message)
        self.status = status


def _b64url_decode(s: str) -> bytes:
    s += "=" * (-len(s) % 4)
    return base64.urlsafe_b64decode(s)


_JWKS_REFETCH_COOLDOWN_S = 30.0
_last_jwks_refetch: dict = {}


def _jwks_refetch_allowed(domain: str) -> bool:
    """Per-domain cooldown: one tenant's refetch (or a forged kid) must
    not block another tenant's rotation recovery."""
    now = time.monotonic()
    if now - _last_jwks_refetch.get(domain, 0.0) >= _JWKS_REFETCH_COOLDOWN_S:
        _last_jwks_refetch[domain] = now
        return True
    return False


_jwks_cache: Dict[str, Dict[str, Any]] = {}


def get_jwks(domain: str) -> Dict[str, Any]:
    """Fetch + cache the tenant's JWKS (reference auth.py:19-34).

    Per-domain dict cache (not lru_cache): key-rotation recovery must be
    able to evict ONE domain's entry without blowing away every other
    tenant's cached keys."""
    cached = _jwks_cache.get(domain)
    if cached is None:
        r = requests.get(f"https://{domain}/.well-known/jwks.json",
                         timeout=15)
        r.raise_for_status()
        cached = r.json()
        _jwks_cache[domain] = cached
    return cached


def _evict_jwks(domain: str) -> None:
    _jwks_cache.pop(domain, None)


def _rsa_key_from_jwk(jwk: Dict[str, str]):
    n = int.from_bytes(_b64url_decode(jwk["n"]), "big")
    e = int.from_bytes(_b64url_decode(jwk["e"]), "big")
    return rsa.RSAPublicNumbers(e, n).public_key()


def verify_jwt(token: str, domain: Optional[str] = None,
               audience: Optional[str] = None) -> Dict[str, Any]:
    """Verify an RS256 JWT: signature, exp, aud, iss (reference auth.py:36-73)."""
    domain = domain or settings.AUTH0_DOMAIN
    audience = audience or settings.AUTH0_AUDIENCE
    try:
        header_b64, payload_b64, sig_b64 = token.split(".")
        header = json.loads(_b64url_decode(header_b64))
        payload = json.loads(_b64url_decode(payload_b64))
        signature = _b64url_decode(sig_b64)
    except Exception as e:
        raise AuthError(f"Malformed token: {e}")

    if header.get("alg") != "RS256":
        raise AuthError(f"Unsupported algorithm {header.get('alg')}")

    def _find_key():
        jwks = get_jwks(domain)
        return next((k for k in jwks.get("keys", [])
                     if k.get("kid") == header.get("kid")), None)

    key_spec = _find_key()
    if key_spec is None and _jwks_refetch_allowed(domain):
        # Unknown kid usually means the tenant rotated its signing keys
        # since the JWKS was cached — evict THIS domain's entry and
        # refetch ONCE before rejecting, or rotation locks every user
        # out until a process restart. (Cooldown-limited so forged kids
        # can't turn this into a JWKS-fetch amplifier.)
        _evict_jwks(domain)
        key_spec = _find_key()
    if key_spec is None:
        raise AuthError("Signing key not found")
    public_key = _rsa_key_from_jwk(key_spec)
    try:
        public_key.verify(
            signature,
            f"{header_b64}.{payload_b64}".encode(),
            padding.PKCS1v15(),
            hashes.SHA256(),
        )
    except Exception:
        raise AuthError("Invalid signature")

    # exp and iss are REQUIRED (jose's decode rejects tokens missing them
    # when issuer= is passed): a token without exp must not live forever,
    # and a token without iss must not skip issuer validation.
    now = time.time()
    if "exp" not in payload:
        raise AuthError("Token missing exp claim")
    if payload["exp"] < now:
        raise AuthError("Token expired")
    aud = payload.get("aud")
    auds = aud if isinstance(aud, list) else [aud]
    if audience and audience not in auds:
        raise AuthError("Invalid audience")
    issuer = f"https://{domain}/"
    if payload.get("iss") != issuer:
        raise AuthError("Invalid issuer")
    return payload


@retry_backoff((requests.RequestException,), max_tries=3, max_time=30)
def get_userinfo(token: str, domain: Optional[str] = None) -> Dict[str, Any]:
    """Auth0 /userinfo with retry (reference auth.py:104-159)."""
    domain = domain or settings.AUTH0_DOMAIN
    r = requests.get(f"https://{domain}/userinfo",
                     headers={"Authorization": f"Bearer {token}"}, timeout=15)
    r.raise_for_status()
    return r.json()


def get_current_user(token: str) -> Dict[str, Any]:
    """Validate the token and return user claims."""
    if settings.AUTH_DISABLED:
        return {"sub": "test-user", "email": "test@example.com"}
    return verify_jwt(token)


def is_task_owner(task: Dict[str, Any], user: Dict[str, Any]) -> bool:
    """Ownership check (reference auth.py:76-101)."""
    return bool(task) and task.get("user_sub") == user.get("sub")
