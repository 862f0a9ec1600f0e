"""Persistent compile cache default-on contract (utils/jax_cache.py)."""

import pytest

from dove_tpu.utils import jax_cache


@pytest.fixture(autouse=True)
def _restore_cache_config():
    """These tests point the GLOBAL jax cache config at tmp dirs; restore
    the conftest-selected suite cache afterwards so later tests in the
    same process keep hitting it."""
    import jax

    before = (jax.config.jax_compilation_cache_dir,
              jax.config.jax_persistent_cache_min_compile_time_secs)
    yield
    jax.config.update("jax_compilation_cache_dir", before[0])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", before[1])


def test_default_dir_is_repo_local():
    d = jax_cache.default_cache_dir()
    assert d.name == ".jax_cache" and (d.parent / "dove_tpu").is_dir()


def test_enable_creates_dir_and_sets_config(tmp_path, monkeypatch):
    monkeypatch.delenv("DOVE_JAX_CACHE", raising=False)
    target = tmp_path / "cache"
    got = jax_cache.enable_persistent_cache(target)
    assert got == str(target) and target.is_dir()
    import jax

    assert jax.config.jax_compilation_cache_dir == str(target)


def test_env_off_disables(monkeypatch, tmp_path):
    for off in ("off", "0", "none"):
        monkeypatch.setenv("DOVE_JAX_CACHE", off)
        assert jax_cache.enable_persistent_cache(tmp_path / "x") is None


def test_env_path_overrides_argument(monkeypatch, tmp_path):
    custom = tmp_path / "custom"
    monkeypatch.setenv("DOVE_JAX_CACHE", str(custom))
    assert jax_cache.enable_persistent_cache() == str(custom)
