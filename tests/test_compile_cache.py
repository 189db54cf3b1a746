"""Persistent-compilation-cache wiring (utils/compile_cache.py).

The cache itself is jax machinery; these tests pin OUR contract: on by
default at package import, idempotent, opt-out env respected, explicit user
configuration never overridden."""

import os

import jax

from vqvae2_tpu.utils import compile_cache


def test_enabled_at_package_import():
    # conftest imported vqvae2_tpu long before this test runs
    assert jax.config.jax_compilation_cache_dir


def test_enable_idempotent():
    first = jax.config.jax_compilation_cache_dir
    assert compile_cache.enable() == first
    assert jax.config.jax_compilation_cache_dir == first


def test_explicit_config_not_overridden():
    active = jax.config.jax_compilation_cache_dir
    # an explicit dir argument must not clobber an already-active cache
    assert compile_cache.enable("/tmp/some-other-cache") == active


def test_cpu_cache_partitioned_per_host_isa():
    # XLA:CPU persists host machine code; a cache dir inherited from a VM
    # with a different CPU must never be replayed here (SIGILL risk per the
    # cpu_aot_loader warning).  On the CPU platform the default dir therefore
    # carries a host-ISA fingerprint; the fingerprint is stable per host.
    active = jax.config.jax_compilation_cache_dir
    assert "-cpu" + os.sep in active + os.sep or "-cpu/" in active
    fp = compile_cache._host_fingerprint()
    assert active.endswith(fp) and len(fp) == 12
    assert fp == compile_cache._host_fingerprint()


def test_opt_out_env(monkeypatch):
    monkeypatch.setenv("VQVAE2_TPU_NO_COMPILE_CACHE", "1")
    assert compile_cache.enable() is None
    # and the active config is left alone
    assert jax.config.jax_compilation_cache_dir
