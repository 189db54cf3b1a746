"""Test harness: force an 8-device virtual CPU mesh (the JAX analogue of the
reference's graceful single-GPU fallback, SURVEY.md §4) so every multi-chip
code path — psums, sharded batches, GSPMD collectives — executes for real
without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell presets JAX_PLATFORMS=axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# sitecustomize imports jax at interpreter start (before this file), latching
# jax_platforms="axon" from the env — override it before any backend init.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {devs}"
    return devs


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def forbid_replication():
    """Turn shard_batch's replication fallback into a test failure: trainer
    integration tests run their batches ACTUALLY 8-way sharded (VERDICT r3:
    4-row batches silently replicated, so BN psums/reduce_dict under real
    sharding never executed for the SYSU families)."""
    import warnings

    from vqvae2_tpu import parallel as par

    par._INDIVISIBLE_WARNED.clear()  # warning is once-per-shape
    with warnings.catch_warnings():
        warnings.filterwarnings("error", message="shard_batch")
        yield
