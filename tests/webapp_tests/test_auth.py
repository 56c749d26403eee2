"""JWT verification tests with a locally-generated RSA keypair."""

import base64
import json
import time

import pytest
from cryptography.hazmat.primitives import hashes, serialization
from cryptography.hazmat.primitives.asymmetric import padding, rsa

from instageo_tpu.webapp import auth


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


@pytest.fixture(scope="module")
def keypair():
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    pub = key.public_key().public_numbers()
    jwk = {
        "kty": "RSA", "kid": "testkey", "use": "sig", "alg": "RS256",
        "n": _b64url(pub.n.to_bytes((pub.n.bit_length() + 7) // 8, "big")),
        "e": _b64url(pub.e.to_bytes(3, "big")),
    }
    return key, {"keys": [jwk]}


def _make_token(key, payload, kid="testkey", alg="RS256"):
    header = {"alg": alg, "typ": "JWT", "kid": kid}
    h = _b64url(json.dumps(header).encode())
    p = _b64url(json.dumps(payload).encode())
    sig = key.sign(f"{h}.{p}".encode(), padding.PKCS1v15(), hashes.SHA256())
    return f"{h}.{p}.{_b64url(sig)}"


@pytest.fixture
def jwks_patched(keypair, monkeypatch):
    _, jwks = keypair
    monkeypatch.setattr(auth, "_jwks_cache", {})
    monkeypatch.setattr(auth, "get_jwks", lambda domain: jwks)


def _payload(**over):
    base = {
        "sub": "auth0|user1",
        "aud": "https://api.example.com",
        "iss": "https://tenant.auth0.com/",
        "exp": time.time() + 3600,
    }
    base.update(over)
    return base


DOMAIN = "tenant.auth0.com"
AUD = "https://api.example.com"


def test_valid_token(keypair, jwks_patched):
    key, _ = keypair
    token = _make_token(key, _payload())
    claims = auth.verify_jwt(token, domain=DOMAIN, audience=AUD)
    assert claims["sub"] == "auth0|user1"


def test_expired_token(keypair, jwks_patched):
    key, _ = keypair
    token = _make_token(key, _payload(exp=time.time() - 10))
    with pytest.raises(auth.AuthError, match="expired"):
        auth.verify_jwt(token, domain=DOMAIN, audience=AUD)


def test_wrong_audience(keypair, jwks_patched):
    key, _ = keypair
    token = _make_token(key, _payload(aud="https://other"))
    with pytest.raises(auth.AuthError, match="audience"):
        auth.verify_jwt(token, domain=DOMAIN, audience=AUD)


def test_wrong_issuer(keypair, jwks_patched):
    key, _ = keypair
    token = _make_token(key, _payload(iss="https://evil.example/"))
    with pytest.raises(auth.AuthError, match="issuer"):
        auth.verify_jwt(token, domain=DOMAIN, audience=AUD)


def test_missing_issuer_rejected(keypair, jwks_patched):
    key, _ = keypair
    payload = _payload()
    del payload["iss"]
    token = _make_token(key, payload)
    with pytest.raises(auth.AuthError, match="issuer"):
        auth.verify_jwt(token, domain=DOMAIN, audience=AUD)


def test_missing_exp_rejected(keypair, jwks_patched):
    key, _ = keypair
    payload = _payload()
    del payload["exp"]
    token = _make_token(key, payload)
    with pytest.raises(auth.AuthError, match="exp"):
        auth.verify_jwt(token, domain=DOMAIN, audience=AUD)


def test_tampered_payload(keypair, jwks_patched):
    key, _ = keypair
    token = _make_token(key, _payload())
    h, p, s = token.split(".")
    evil = _b64url(json.dumps(_payload(sub="auth0|attacker")).encode())
    with pytest.raises(auth.AuthError, match="signature"):
        auth.verify_jwt(f"{h}.{evil}.{s}", domain=DOMAIN, audience=AUD)


def test_wrong_key(jwks_patched):
    other = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    token = _make_token(other, _payload())
    with pytest.raises(auth.AuthError, match="signature"):
        auth.verify_jwt(token, domain=DOMAIN, audience=AUD)


def test_unknown_kid(keypair, jwks_patched):
    key, _ = keypair
    token = _make_token(key, _payload(), kid="nope")
    with pytest.raises(auth.AuthError, match="key not found"):
        auth.verify_jwt(token, domain=DOMAIN, audience=AUD)


def test_unsupported_alg(keypair, jwks_patched):
    # alg=none style downgrade must be rejected
    header = {"alg": "none", "typ": "JWT", "kid": "testkey"}
    h = _b64url(json.dumps(header).encode())
    p = _b64url(json.dumps(_payload()).encode())
    with pytest.raises(auth.AuthError, match="algorithm"):
        auth.verify_jwt(f"{h}.{p}.", domain=DOMAIN, audience=AUD)


def test_malformed_token(jwks_patched):
    with pytest.raises(auth.AuthError, match="Malformed"):
        auth.verify_jwt("not-a-jwt", domain=DOMAIN, audience=AUD)


def test_is_task_owner():
    task = {"user_sub": "auth0|user1"}
    assert auth.is_task_owner(task, {"sub": "auth0|user1"})
    assert not auth.is_task_owner(task, {"sub": "auth0|other"})
    assert not auth.is_task_owner(None, {"sub": "auth0|user1"})


def test_key_rotation_refetches_jwks(keypair, monkeypatch):
    """A token signed with a new kid triggers one JWKS refetch instead of
    failing until process restart: the FIRST fetch serves the stale
    (pre-rotation) key set, only the refetch sees the rotated one."""
    from instageo_tpu.webapp import auth

    key, jwks = keypair
    stale = jwks
    rotated = {"keys": [{**jwks["keys"][0], "kid": "rotated"}]}
    calls = {"n": 0}

    def fake_get_jwks(domain):
        calls["n"] += 1
        return stale if calls["n"] == 1 else rotated

    monkeypatch.setattr(auth, "get_jwks", fake_get_jwks)
    monkeypatch.setattr(auth, "_last_jwks_refetch", {})
    token = _make_token(key, _payload(), kid="rotated")
    user = auth.verify_jwt(token, domain=DOMAIN, audience=AUD)
    assert user["sub"] == _payload()["sub"]
    assert calls["n"] == 2  # stale miss -> cache-bust -> refetch hit

    # Cooldown: a forged kid inside the window gets NO second refetch
    # (exactly one lookup call, not another cache-bust pair).
    before = calls["n"]
    with pytest.raises(auth.AuthError, match="Signing key"):
        auth.verify_jwt(_make_token(key, _payload(), kid="forged"),
                        domain=DOMAIN, audience=AUD)
    assert calls["n"] == before + 1
