"""API docs: spec completeness vs the live router + page rendering."""

import asyncio

import pytest
from aiohttp.test_utils import TestClient, TestServer

from instageo_tpu.webapp.docs import build_openapi_spec
from instageo_tpu.webapp.main import PUBLIC_ROUTES, create_app


def _run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


@pytest.fixture()
def app(tmp_path):
    return create_app(db_path=str(tmp_path / "t.sqlite"))


def _api_routes(app):
    out = set()
    for r in app.router.routes():
        info = r.resource.get_info() if r.resource else {}
        path = info.get("path") or info.get("formatter") or ""
        if path.startswith("/api") and r.method in ("GET", "POST"):
            out.add((r.method.lower(), path))
    return out


def test_spec_covers_every_api_route(app):
    spec = build_openapi_spec()
    spec_ops = {(method, path)
                for path, methods in spec["paths"].items()
                for method in methods}
    missing = _api_routes(app) - spec_ops - {
        ("get", "/api/docs"), ("get", "/api/openapi.json")}
    assert not missing, f"routes missing from the OpenAPI spec: {missing}"
    # and nothing documented that doesn't exist
    stale = spec_ops - _api_routes(app)
    assert not stale, f"spec documents unregistered routes: {stale}"


def test_docs_endpoints_public_and_render(app):
    assert "/api/docs" in PUBLIC_ROUTES
    assert "/api/openapi.json" in PUBLIC_ROUTES

    async def go():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.get("/api/openapi.json")
            assert r.status == 200
            spec = await r.json()
            assert spec["openapi"].startswith("3.")
            assert spec["info"]["title"] == "InstaGeo API"

            r = await client.get("/api/docs")
            assert r.status == 200
            body = await r.text()
            assert "text/html" in r.headers["Content-Type"]
            # every path shows up on the page
            for path in spec["paths"]:
                assert path in body
            # zero external assets (air-gapped deployments)
            assert "http://" not in body and "https://" not in body
        finally:
            await client.close()

    _run(go())
