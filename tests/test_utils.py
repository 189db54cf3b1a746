"""Utils tests: scheduler zoo vs reference formulas, checkpoint round-trip,
image grids, metrics, config presets."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from vqvae2_tpu.utils import schedules


def test_cycle_schedule_shape():
    n = 1000
    s = schedules.cycle_schedule(3e-4, n)
    vals = np.asarray([float(s(i)) for i in range(0, n, 50)] + [float(s(n - 1))])
    # warmup phase rises from lr_max/25 toward lr_max
    assert vals[0] < 3e-4
    peak = max(float(s(i)) for i in range(0, n, 10))
    assert peak == pytest.approx(3e-4, rel=0.05)
    # end decays to ~lr_min/1e4
    assert float(s(n - 1)) < 3e-4 / 25 / 100


def test_cycle_momentum_mirrors():
    n = 1000
    m = schedules.cycle_momentum_schedule(n)
    assert float(m(0)) > float(m(int(n * 0.3) - 1))  # decreasing in warmup
    assert float(m(int(n * 0.3))) == pytest.approx(0.85, abs=0.01)
    assert float(m(n - 1)) == pytest.approx(0.95, abs=0.01)


def test_reference_formula_parity():
    """Spot-check the zoo against the reference's python-math formulas
    (scheduler.py:6-136)."""
    lr_min, lr_max, step_size = 1e-5, 1e-3, 100
    cos = schedules.cosine_lr(lr_min, lr_max, step_size)
    for i in (0, 10, 55, 99, 150):
        ref = lr_min + 0.5 * (lr_max - lr_min) * (
            1 + math.cos((i % step_size) / step_size * math.pi))
        assert float(cos(i)) == pytest.approx(ref, rel=1e-5)

    power = schedules.power_lr(lr_min, lr_max, warmup=10)
    for i in (0, 5, 9):
        ref = lr_min + (lr_max - lr_min) / 10 * i
        assert float(power(i)) == pytest.approx(ref, rel=1e-5)
    for i in (10, 50):
        ref = lr_max * (i - 10 + 1) ** -0.5
        assert float(power(i)) == pytest.approx(ref, rel=1e-5)

    noam = schedules.noam_warmup(model_dim=512, warmup=4000)
    for i in (0, 100, 3999, 8000):
        it = i + 1
        ref = 512 ** -0.5 * min(it ** -0.5, it * 4000 ** -1.5)
        assert float(noam(i)) == pytest.approx(ref, rel=1e-5)

    ms = schedules.multi_step_lr(0.1, [20, 40], gamma=0.1)
    assert float(ms(0)) == pytest.approx(0.1)
    assert float(ms(25)) == pytest.approx(0.01)
    assert float(ms(45)) == pytest.approx(0.001, rel=1e-5)

    sr = schedules.stepped_reid_lr(0.1)
    assert float(sr(5)) == pytest.approx(0.1)
    assert float(sr(30)) == pytest.approx(0.01)
    assert float(sr(70)) == pytest.approx(0.001, rel=1e-5)
    assert float(sr(150)) == pytest.approx(0.0001, rel=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from vqvae2_tpu.utils.checkpoint import CheckpointManager

    state = {"w": jnp.arange(12.0).reshape(3, 4), "step": jnp.asarray(7)}
    mgr = CheckpointManager(str(tmp_path / "ckpt"), config={"lr": 1e-3})
    mgr.save_periodic(10, state)
    mgr.save_last(state)
    assert mgr.save_best(0.5, state)
    assert not mgr.save_best(0.3, state)  # worse -> not saved
    assert mgr.latest_step() == 10
    assert mgr.load_config()["lr"] == 1e-3

    template = {"w": jnp.zeros((3, 4)), "step": jnp.asarray(0)}
    restored = mgr.restore("last", template)
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(state["w"]))
    assert int(restored["step"]) == 7


def test_make_grid_and_save(tmp_path, rng):
    from vqvae2_tpu.utils.image import make_grid, save_image

    imgs = rng.normal(size=(10, 8, 8, 3)).astype(np.float32)
    grid = make_grid(imgs, nrow=4)
    assert grid.dtype == np.uint8
    # 3 rows of 4 cols (10 -> ceil to 3 rows)
    assert grid.shape == (3 * 10 + 2, 4 * 10 + 2, 3)
    p = tmp_path / "g.png"
    save_image(imgs, str(p))
    assert p.exists()


def test_metrics_logger():
    from vqvae2_tpu.utils.metrics import MetricLogger, SmoothedValue, StepTimer

    sv = SmoothedValue(window_size=3)
    for v in (1.0, 2.0, 3.0, 4.0):
        sv.update(v)
    assert sv.median == 3.0 and sv.global_avg == 2.5 and sv.value == 4.0

    ml = MetricLogger()
    ml.update(loss=1.0, acc=0.5)
    assert "loss" in str(ml)

    st = StepTimer(skip_first=1)
    for _ in range(4):
        st.tick()
    assert st.mean >= 0


def test_config_presets_roundtrip():
    from vqvae2_tpu.utils.config import PRESETS, PixelSnailConfig

    args = PRESETS["pixelsnail_top"].to_args()
    assert args.hier == "top" and args.n_class == 512
    alt = PixelSnailConfig().replace(hier="bottom", steps=3)
    assert alt.to_args().hier == "bottom"


def test_shard_batch_indivisible_guard():
    """Non-divisible batches replicate with a warning; strict mode raises
    (VERDICT r1 item 10 — no silent n-times redundant compute)."""
    import warnings

    import jax

    from vqvae2_tpu import parallel as par

    mesh = par.make_mesh(jax.devices())
    n = mesh.shape[par.DATA_AXIS]
    assert n == 8  # conftest forces the 8-device virtual CPU mesh

    par._INDIVISIBLE_WARNED.clear()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = par.shard_batch(np.zeros((n + 1, 4), np.float32), mesh)
        assert any("not divisible" in str(w.message) for w in caught)
    assert out.shape == (n + 1, 4)  # replicated, data intact

    # warning dedupes per (shape, n)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        par.shard_batch(np.zeros((n + 1, 4), np.float32), mesh)
        assert not any("not divisible" in str(w.message) for w in caught)

    with pytest.raises(ValueError, match="not divisible"):
        par.shard_batch(np.zeros((n + 1, 4), np.float32), mesh, strict=True)

    # divisible batches shard silently, strict or not
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        xs = par.shard_batch(np.zeros((n * 2, 4), np.float32), mesh, strict=True)
        assert not any("not divisible" in str(w.message) for w in caught)
    assert xs.shape == (n * 2, 4)


def test_lr_finder_records_and_suggests(tmp_path):
    """LRFinder = schedule + loss recording + CSV + suggestion (reference
    scheduler.py:323-354)."""
    import jax
    import optax

    from vqvae2_tpu.utils.schedules import LRFinder

    # 1-D quadratic: loss = 0.5*w^2; SGD diverges once lr > 2.  The lr range
    # crosses 2 mid-sweep so the EMA-smoothed divergence test (one noisy raw
    # step must NOT terminate the sweep — reference LRFinder smooths first)
    # sees a blow-up that is real at the smoothed-loss scale.
    finder = LRFinder(0.1, 10.0, step_size=30)
    w = jnp.asarray(5.0)
    tx = optax.sgd(finder.schedule)
    opt_state = tx.init(w)
    grad_fn = jax.value_and_grad(lambda w: 0.5 * w * w)
    # run past step_size (the schedule keeps growing) — the quadratic decays
    # to ~1e-21 in the descent region, so the smoothed blow-up needs room to
    # climb back through the smoothed-loss scale
    for _ in range(45):
        loss, g = grad_fn(w)
        finder.record(loss)
        if finder.diverged:
            break
        upd, opt_state = tx.update(g, opt_state, w)
        w = optax.apply_updates(w, upd)
    assert finder.diverged, "sweep into lr=10 must diverge for a quadratic"
    assert len(finder.lrs) == len(finder.losses) >= 3
    assert all(b > a for a, b in zip(finder.lrs, finder.lrs[1:]))  # monotone
    lr = finder.suggest()
    assert 0.1 <= lr <= 2.5, lr  # in the stable region, not the blow-up

    # a single noisy raw step in an otherwise-descending sweep must not trip
    # the smoothed divergence test
    noisy = LRFinder(0.1, 1.0, step_size=20)
    for i, v in enumerate([1.0, 0.8, 0.6, 0.5, 2.5, 0.4, 0.35]):
        noisy.record(v)
        assert not noisy.diverged, f"noise spike at step {i} ended the sweep"

    out = tmp_path / "lrfind.csv"
    finder.save(str(out))
    lines = out.read_text().strip().splitlines()
    assert len(lines) == len(finder.lrs)
    assert float(lines[0].split(",")[0]) == finder.lrs[0]


def test_iterate_batches_workers_and_prefetch_iter():
    """Worker-pool decode preserves order/content (reference
    DataLoader(num_workers=N) equivalence); prefetch_iter propagates
    producer errors."""
    from vqvae2_tpu.data.datasets import (SyntheticImages, iterate_batches,
                                          prefetch_iter)

    ds = SyntheticImages(n=20, size=8)
    serial = [(b[0].sum(), b[1].tolist())
              for b in iterate_batches(ds, 4, seed=1, workers=0)]
    pooled = [(b[0].sum(), b[1].tolist())
              for b in iterate_batches(ds, 4, seed=1, workers=4)]
    assert len(serial) == 5
    for (sa, la), (sb, lb) in zip(serial, pooled):
        assert la == lb and np.isclose(sa, sb)

    assert list(prefetch_iter(lambda: range(7))) == list(range(7))

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    with pytest.raises(RuntimeError, match="producer failed"):
        list(prefetch_iter(boom))


def test_raw_uint8_path_matches_normalized():
    """raw=True datasets ship uint8 (4x less host->device traffic) and
    to_unit_device must reproduce the host normalize exactly; the stage-1
    loss_fn accepts either dtype."""
    import jax.numpy as jnp

    from vqvae2_tpu.data.datasets import normalize_to_unit, to_unit_device
    from vqvae2_tpu.data.shapes import ShapesDataset

    ds_f = ShapesDataset(n=2, size=32)
    ds_u = ShapesDataset(n=2, size=32, raw=True)
    xf, _, _ = ds_f[0]
    xu, _, _ = ds_u[0]
    assert xu.dtype == np.uint8 and xf.dtype == np.float32
    np.testing.assert_array_equal(np.asarray(to_unit_device(jnp.asarray(xu))),
                                  normalize_to_unit(xu))
    np.testing.assert_array_equal(normalize_to_unit(xu), xf)
    # float input passes through untouched
    np.testing.assert_array_equal(
        np.asarray(to_unit_device(jnp.asarray(xf))), xf)
