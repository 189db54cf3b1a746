"""CPU smoke tests for the --heavy hardware checks in scripts/tpu_checks.py.

Each heavy check's first TPU execution is a 5-40 minute remote compile, so a
shape bug or wrong kwarg discovered on hardware wastes real wall-clock.
These run the SAME check bodies at tiny configs on the CPU backend: they
trace, execute, time, and assert their loss decrease end-to-end — only the
model/batch geometry differs.  Deterministic (fixed seeds).  Each takes
5-15 min of XLA:CPU compile, so they carry their own opt-in marker
(`pytest -m heavy_smoke`, or select the single test matching the check you
edited) instead of living in the slow tier.
"""

import importlib.util
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "tpu_checks", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "tpu_checks.py"))
tpu_checks = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(tpu_checks)


@pytest.mark.heavy_smoke
def test_check_reid_step_tiny():
    msg = tpu_checks.check_reid_step(
        heavy=True, n_ids=2, num_pos=2, hw=(96, 48), arch="resnet18",
        class_num=4, n_steps=2)
    assert "ms/step" in msg


@pytest.mark.heavy_smoke
def test_check_adaptive_deep_step_tiny():
    msg = tpu_checks.check_adaptive_deep_step(
        heavy=True, n_ids=2, num_pos=2, hw=(48, 16), arch="resnet18",
        class_num=4, n_steps=2)
    assert "ms/step" in msg


@pytest.mark.heavy_smoke
def test_check_stargan_step_tiny():
    msg = tpu_checks.check_stargan_step(
        heavy=True, n_ids=2, num_pos=2, hw=(64, 64), arch="resnet18",
        class_num=4, img_size=64, n_steps=2)
    assert "ms/step" in msg


@pytest.mark.heavy_smoke
def test_check_ssd_step_tiny():
    msg = tpu_checks.check_ssd_step(heavy=True, batch=2, n_steps=2)
    assert "ms/step" in msg


@pytest.mark.heavy_smoke
def test_check_maskrcnn_step_tiny():
    msg = tpu_checks.check_maskrcnn_step(
        heavy=True, batch=2, size=64, num_proposals=16, n_steps=2)
    assert "ms/step" in msg


@pytest.mark.heavy_smoke
def test_check_reid_extract_tiny():
    msg = tpu_checks.check_reid_extract(
        heavy=True, batch=4, hw=(96, 48), arch="resnet18", class_num=4,
        n_iter=2, min_ips=0.0)
    assert "img/s" in msg


def test_heavy_checks_skipped_by_default():
    # without --heavy every heavy check must be a cheap no-op
    for fn in tpu_checks.HEAVY_CHECKS:
        assert "skipped" in fn(heavy=False)


def test_run_one_dispatch_cli():
    # --run-one dispatches by function name in a child process without
    # importing jax (the heavy check skips before any device work)
    import subprocess
    import sys
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "tpu_checks.py")
    out = subprocess.run(
        [sys.executable, script, "--run-one", "check_ssd_step"],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert "skipped (needs --heavy)" in out.stdout


def test_heavy_isolation_cli_no_match():
    # the isolation loop itself: --heavy with a non-matching --only filter
    # exits 0 after spawning zero subprocesses (CPU platform for the child)
    import subprocess
    import sys
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "tpu_checks.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, script, "--heavy", "--only", "no-such-check"],
        capture_output=True, text=True, env=env)
    assert out.returncode == 0, out.stderr
    assert "0 checks" in out.stdout
