"""Persistent XLA compilation cache, on by default.

The reference pays its compile cost implicitly (eager torch); here every
trainer is one big jitted program, and on the tunneled-TPU image a stage-2
train-step graph can take 10-40 minutes to remote-compile *per process*
(CLAUDE.md "Known infra quirks").  JAX's persistent compilation cache keys
compiled executables by an HLO+flags hash, so enabling it turns every
re-launch (resumed training, extract-after-train, tpu_checks re-runs) into a
disk load: measured on this image, the 256px stage-1 train step drops from
12.1 s to 1.2 s first-step wall time in a fresh process, and the cache works
through the axon remote-compile helper unchanged.

Enabled at package import (`vqvae2_tpu/__init__.py`).  Opt out with
``VQVAE2_TPU_NO_COMPILE_CACHE=1``; redirect with ``JAX_COMPILATION_CACHE_DIR``
(JAX's own variable, respected by never overriding an explicit setting).
"""

from __future__ import annotations

import hashlib
import os
import platform as _platform

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "vqvae2_tpu", "xla")


def _host_fingerprint() -> str:
    """Short hash of the host CPU's ISA surface.

    XLA:CPU persists ahead-of-time machine code; replaying an entry compiled
    on a host with different CPU features loads code the loader itself warns
    "could lead to execution errors such as SIGILL".  The cache directory can
    outlive the VM image, so CPU-backend caches must be partitioned per host
    ISA.  (TPU executables are keyed by the TPU target, not the host, and
    deliberately share one directory — that is what saves the 10-40 min
    tunneled remote recompiles across re-launches.)
    """
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{_platform.machine()}|{flags}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def enable(cache_dir: str | None = None) -> str | None:
    """Idempotently enable the persistent compilation cache.

    Returns the active cache directory, or None when opted out.  Safe to call
    after jax is imported (the config is read at compile time, not at backend
    init — which matters here because sitecustomize imports jax before any
    user code runs).
    """
    if os.environ.get("VQVAE2_TPU_NO_COMPILE_CACHE"):
        return None
    import jax

    active = jax.config.jax_compilation_cache_dir
    if active:  # user already configured it (flag or JAX_COMPILATION_CACHE_DIR)
        return active
    if cache_dir is None:
        cache_dir = _DEFAULT_DIR
        # CPU executables are host machine code: isolate them per host ISA so
        # a cache dir inherited from a different VM can never feed this host
        # stale AOT code.  Platform is decided by config/env before backend
        # init, so reading the flag here does not initialize a backend.
        plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
        if plats.split(",")[0].strip() in ("", "cpu"):
            cache_dir = os.path.join(cache_dir + "-cpu", _host_fingerprint())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Default thresholds skip small programs; a tunneled remote compile is
    # expensive enough that caching everything nontrivial pays.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
