"""Compilation-cache knobs (INSTAGEO_COMPILE_CACHE[_DIR])."""

import jax

from instageo_tpu.utils.compile_cache import enable_compilation_cache


def test_opt_out(monkeypatch):
    monkeypatch.setenv("INSTAGEO_COMPILE_CACHE", "0")
    assert enable_compilation_cache() is False


def test_env_dir_honored(monkeypatch, tmp_path):
    # The cache dir is process-global jax config: restore it afterwards
    # so the suite keeps hitting the warm shared cache.
    original = jax.config.jax_compilation_cache_dir
    monkeypatch.delenv("INSTAGEO_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("INSTAGEO_COMPILE_CACHE_DIR", str(tmp_path / "cc"))
    assert enable_compilation_cache() is True
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
    assert (tmp_path / "cc").is_dir()
    # Explicit argument wins over the env var.
    assert enable_compilation_cache(str(tmp_path / "explicit")) is True
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "explicit")
    if original:
        jax.config.update("jax_compilation_cache_dir", original)
