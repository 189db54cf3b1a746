"""One-step integration tests for the adaptation/ReID trainers on tiny
synthetic SYSU data (CPU mesh — the TPU path shares the same jitted step)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_sysu(tmp_path_factory):
    from vqvae2_tpu.train.reid import make_synthetic_sysu

    d = tmp_path_factory.mktemp("sysu")
    return make_synthetic_sysu(str(d), n_ids=4, per_id=4, h=48, w=24)


def _make_raw_sysu(root, rng, ids=(1, 2, 3), hw=(48, 24)):
    """Raw SYSU-MM01 layout (cam dirs + exp/test_id.txt) for validate()."""
    from PIL import Image

    (root / "exp").mkdir(parents=True)
    with open(root / "exp" / "test_id.txt", "w") as f:
        f.write(",".join(map(str, ids)) + "\n")
    for cam in [f"cam{i}" for i in range(1, 7)]:
        for pid in ids:
            d = root / cam / ("%04d" % pid)
            d.mkdir(parents=True)
            for k in range(2):
                arr = rng.integers(0, 255, size=(*hw, 3)).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{k:04d}.jpg")
    return root


def test_every_trainer_accepts_metrics_csv():
    """--metrics_csv is a framework-wide contract (loss curves for
    convergence evidence) — every trainer CLI must take it."""
    import importlib

    for mod in ("vqvae", "pixelsnail", "pixelsnail_mnist", "reid",
                "adaptive", "gray2color", "detection", "maskrcnn",
                "vqvae_deep", "vqvae_deep_bi", "vqvae_deep_ir",
                "stargan_bi"):
        m = importlib.import_module(f"vqvae2_tpu.train.{mod}")
        argv = ["--metrics_csv", "m.csv"]
        if mod == "pixelsnail":
            argv = ["codes.vq2"] + argv  # required positional code store
        args, _ = m.build_argparser().parse_known_args(argv)
        assert args.metrics_csv == "m.csv", mod


@pytest.mark.slow
def test_reid_trainer_one_step(tiny_sysu, tmp_path, forbid_replication):
    from vqvae2_tpu.train import reid

    raw = _make_raw_sysu(tmp_path / "SYSU-MM01",
                         np.random.default_rng(0))
    args = reid.build_argparser().parse_args([
        "--path", tiny_sysu, "--steps", "2", "--batch_size", "4",
        "--num_pos", "2", "--arch", "resnet18", "--img_h", "48",
        "--img_w", "24", "--log_every", "1",
        "--sample_dir", str(tmp_path), "--sample_every", "2",
        "--eval_every", "1", "--eval_path", str(raw),
        "--metrics_csv", str(tmp_path / "loss.csv"),
        "--map_csv", str(tmp_path / "map.csv"),
    ])
    m = reid.train(args)
    for k in ("loss", "id", "tri", "part", "unsup", "c2g"):
        assert np.isfinite(m[k]), f"{k} not finite: {m}"
    assert list(tmp_path.glob("part_*.png")), "part-parsing grid not dumped"
    assert "mAP" in m and 0.0 <= m["mAP"] <= 1.0
    assert "loss" in (tmp_path / "loss.csv").read_text().splitlines()[0]
    assert "mAP" in (tmp_path / "map.csv").read_text().splitlines()[0]


@pytest.mark.slow
def test_gray2color_trainer_one_step(tiny_sysu, tmp_path, forbid_replication):
    from vqvae2_tpu.train import gray2color

    args = gray2color.build_argparser().parse_args([
        "--path", tiny_sysu, "--steps", "2", "--batch_size", "4",
        "--num_pos", "2", "--arch", "resnet18", "--log_every", "1",
        "--sample_dir", str(tmp_path), "--sample_every", "2",
    ])
    m = gray2color.train(args)
    assert np.isfinite(m["loss"]) and np.isfinite(m["latent"])
    assert (tmp_path / "00002.png").exists()  # colorization grid dumped


@pytest.mark.slow
def test_deep_adaptive_trainer_one_step(tmp_path_factory, forbid_replication):
    from vqvae2_tpu.train import vqvae_deep
    from vqvae2_tpu.train.reid import make_synthetic_sysu

    # deep hierarchy needs H/8, W/8 even (top stride-2 must invert exactly)
    d = make_synthetic_sysu(str(tmp_path_factory.mktemp("sysu_deep")),
                            n_ids=4, per_id=4, h=64, w=32)
    sample_dir = tmp_path_factory.mktemp("deep_samples")
    args = vqvae_deep.build_argparser().parse_args([
        "--path", d, "--steps", "2", "--batch_size", "4",
        "--num_pos", "2", "--arch", "resnet18", "--log_every", "1",
        "--sample_dir", str(sample_dir), "--sample_every", "2",
    ])
    m = vqvae_deep.train(args)
    for k in ("loss_reid", "loss_gen", "recon", "latent"):
        assert np.isfinite(m[k]), f"{k} not finite: {m}"
    assert list(sample_dir.glob("*.png")), "sample grid not dumped"
