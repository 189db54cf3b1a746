"""One-step integration tests for the remaining trainers: ModelAdaptive
(fork train_vqvae), bidirectional cycle, StarGAN bi, staged IR."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_sysu(tmp_path_factory):
    from vqvae2_tpu.train.reid import make_synthetic_sysu

    d = tmp_path_factory.mktemp("sysu2")
    # H/8, W/8 even: required by the deep hierarchy (top stride-2 inversion)
    return make_synthetic_sysu(str(d), n_ids=4, per_id=4, h=64, w=32)


@pytest.fixture(scope="module")
def tiny_sysu_sq(tmp_path_factory):
    from vqvae2_tpu.train.reid import make_synthetic_sysu

    d = tmp_path_factory.mktemp("sysu_sq")
    return make_synthetic_sysu(str(d), n_ids=4, per_id=4, h=64, w=64)


@pytest.mark.slow
def test_adaptive_trainer_one_step(tiny_sysu, forbid_replication):
    from vqvae2_tpu.train import adaptive

    args = adaptive.build_argparser().parse_args([
        "--path", tiny_sysu, "--steps", "2", "--batch_size", "4",
        "--num_pos", "2", "--arch", "resnet18", "--log_every", "1",
    ])
    m = adaptive.train(args)
    for k in ("mse", "latent", "id_fake", "kl_fake", "loss_reid"):
        assert np.isfinite(m[k]), f"{k} not finite: {m}"


@pytest.mark.slow
def test_bi_trainer_one_step(tiny_sysu, forbid_replication):
    from vqvae2_tpu.train import vqvae_deep_bi

    args = vqvae_deep_bi.build_argparser().parse_args([
        "--path", tiny_sysu, "--steps", "2", "--batch_size", "4",
        "--num_pos", "2", "--arch", "resnet18", "--log_every", "1",
    ])
    m = vqvae_deep_bi.train(args)
    for k in ("cycle", "latent", "loss_gen", "loss_reid", "disc_fake"):
        assert np.isfinite(m[k]), f"{k} not finite: {m}"


@pytest.mark.slow
def test_stargan_bi_trainer_one_step(tiny_sysu_sq, tmp_path, forbid_replication):
    from vqvae2_tpu.train import stargan_bi

    args = stargan_bi.build_argparser().parse_args([
        "--path", tiny_sysu_sq, "--steps", "2", "--batch_size", "4",
        "--num_pos", "2", "--arch", "resnet18", "--log_every", "1",
        "--sample_dir", str(tmp_path), "--sample_every", "2",
        "--d_every", "2", "--eval_every", "2",
        "--map_csv", str(tmp_path / "map.csv"),
    ])
    m = stargan_bi.train(args)
    for k in ("cycle", "loss_gen", "loss_disc", "loss_reid", "r1",
              "hinge_pos", "hinge_neg"):
        assert np.isfinite(m[k]), f"{k} not finite: {m}"
    # normalized hinge inputs: centers of unit vectors are O(1) apart
    assert m["hinge_pos"] < 4.0 and m["hinge_neg"] < 4.0, m
    assert 0.0 <= m["idpres_map"] <= 1.0, m
    assert (tmp_path / "00002.png").exists()  # translation grid dumped
    assert (tmp_path / "map.csv").exists()


@pytest.mark.slow
def test_ir_trainer_both_stages(tiny_sysu, tmp_path, forbid_replication):
    from vqvae2_tpu.train import vqvae_deep_ir

    # steps mode: stage_reconstruction counts steps; 1 recon + 1 full
    args = vqvae_deep_ir.build_argparser().parse_args([
        "--path", tiny_sysu, "--steps", "2", "--stage_reconstruction", "1",
        "--batch_size", "4", "--num_pos", "2", "--arch", "resnet18",
        "--log_every", "1",
        "--sample_dir", str(tmp_path), "--sample_every", "2",
    ])
    m = vqvae_deep_ir.train(args)
    for k in ("loss_gen", "latent"):
        assert np.isfinite(m[k]), f"{k} not finite: {m}"
    assert list(tmp_path.glob("*.png")), "sample grid not dumped"
