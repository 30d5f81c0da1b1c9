"""Persistent-compilation-cache plumbing (core/cache.py).

The cache module only routes jax's ``jax_compilation_cache_dir`` config; the
actual cache behaviour (72 s cold compile -> 0.7 s warm, measured on the TPU
relay) is jax's own and is not re-tested here.  These tests pin the contract:
TPU-only by default (XLA:CPU AOT entries are machine-feature-specific and a
shared cache across heterogeneous hosts risks SIGILL), idempotence, env-var
opt-in/out, directory override, and respect for pre-existing configuration.

The suite runs on the CPU backend, so ``DVL_JAX_CACHE=1`` (force-enable on
any backend) stands in for the TPU auto-enable path.
"""

import importlib
import os

import jax

from debias_vision_lang_tpu.core import cache


def _fresh(monkeypatch, **env):
    """Reload the module (resets the _DONE latch) with a controlled env."""
    for key in ("DVL_JAX_CACHE", "DVL_JAX_CACHE_DIR", "JAX_COMPILATION_CACHE_DIR"):
        monkeypatch.delenv(key, raising=False)
    for key, val in env.items():
        monkeypatch.setenv(key, val)
    return importlib.reload(cache)


def test_disabled_by_env(monkeypatch):
    mod = _fresh(monkeypatch, DVL_JAX_CACHE="0")
    assert mod.enable_compilation_cache() is False
    assert not mod._DONE


def test_non_tpu_backend_skipped_by_default(monkeypatch):
    # this suite runs on CPU: without the force flag the cache must stay off
    mod = _fresh(monkeypatch)
    assert jax.default_backend() != "tpu"
    assert mod.enable_compilation_cache() is False
    assert not mod._DONE


def test_respects_existing_env_routing(monkeypatch):
    mod = _fresh(monkeypatch, DVL_JAX_CACHE="1",
                 JAX_COMPILATION_CACHE_DIR="/tmp/someplace")
    assert mod.enable_compilation_cache() is True
    # must NOT have clobbered jax config — the env var is jax's own channel
    assert mod._DONE


def test_dir_override_and_idempotence(tmp_path, monkeypatch):
    target = str(tmp_path / "jc")
    prev = getattr(jax.config, "jax_compilation_cache_dir", None)
    # conftest routes the suite's own cache dir; this test needs the
    # helper's no-preexisting-config path, so clear it (restored below)
    jax.config.update("jax_compilation_cache_dir", None)
    mod = _fresh(monkeypatch, DVL_JAX_CACHE="1", DVL_JAX_CACHE_DIR=target)
    try:
        assert mod.enable_compilation_cache() is True
        assert jax.config.jax_compilation_cache_dir == target
        assert os.path.isdir(target)
        # second call: latched, no re-config
        assert mod.enable_compilation_cache() is True
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        importlib.reload(cache)


def test_respects_existing_jax_config(tmp_path, monkeypatch):
    prev = getattr(jax.config, "jax_compilation_cache_dir", None)
    jax.config.update("jax_compilation_cache_dir", str(tmp_path / "user"))
    try:
        mod = _fresh(monkeypatch, DVL_JAX_CACHE="1")
        assert mod.enable_compilation_cache() is True
        # user's configured dir left untouched
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "user")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        importlib.reload(cache)
