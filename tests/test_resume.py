"""Checkpoint/resume integration: the stage-1 trainer must restore its state
(step counter, params, EMA codebook, optimizer) and continue training."""

import numpy as np
import pytest


def test_restore_latest_fresh_dir(tmp_path):
    """``--resume`` on a fresh checkpoint dir must start clean, not crash
    (round-5 chip chain: steps [2/4] and [3/4] both died on
    FileNotFoundError when the run dir had no checkpoint yet)."""
    from vqvae2_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"))
    target = {"a": np.zeros((2,), np.float32), "b": np.zeros((), np.int32)}
    state, name = mgr.restore_latest(target)
    assert name is None and state is target

    mgr.save_last({"a": np.ones((2,), np.float32),
                   "b": np.asarray(7, np.int32)})
    state, name = mgr.restore_latest(target)
    assert name == "last" and int(state["b"]) == 7

    mgr.save_periodic(10, {"a": np.ones((2,), np.float32),
                           "b": np.asarray(10, np.int32)})
    state, name = mgr.restore_latest(target)
    assert name == "step_0000010" and int(state["b"]) == 10


@pytest.mark.slow
def test_vqvae_trainer_resume(tmp_path):
    from vqvae2_tpu.train import vqvae as tv

    base = [
        "--synthetic", "--steps", "4", "--batch_size", "8", "--size", "32",
        "--channel", "16", "--n_res_block", "1", "--n_res_channel", "8",
        "--embed_dim", "8", "--log_every", "2",
        "--ckpt_dir", str(tmp_path / "ckpt"),
    ]
    # first launch WITH --resume: fresh dir must start clean (tolerant
    # restore_latest), matching how the evidence chain scripts invoke it
    args = tv.build_argparser().parse_args(base + ["--resume"])
    m1 = tv.train(args)
    assert np.isfinite(m1["loss"])

    args2 = tv.build_argparser().parse_args(base + ["--resume"])
    m2 = tv.train(args2)
    assert np.isfinite(m2["loss"])
    # resumed training should not be worse than a wildly different loss scale
    assert abs(m2["loss"] - m1["loss"]) < 1.0


@pytest.mark.slow
def test_pixelsnail_trainer_resume(tmp_path):
    import jax
    import jax.numpy as jnp

    from vqvae2_tpu.data.codestore import CodeStoreWriter
    from vqvae2_tpu.train import pixelsnail as ps

    rng = np.random.default_rng(0)
    path = str(tmp_path / "codes.vq2")
    with CodeStoreWriter(path, (4, 4), (8, 8)) as w:
        w.append(rng.integers(0, 16, (32, 4, 4)).astype(np.int16),
                 rng.integers(0, 16, (32, 8, 8)).astype(np.int16),
                 np.zeros(32, np.int32), [f"{i}" for i in range(32)])

    base = [path, "--steps", "4", "--batch", "8", "--channel", "16",
            "--n_res_block", "1", "--n_res_channel", "16", "--n_class", "16",
            "--log_every", "2", "--ckpt_dir", str(tmp_path / "ck")]
    args = ps.build_argparser().parse_args(base)
    args.hier = "top"
    # force a periodic save each epoch for the resume to find
    m1 = ps.train(args)
    assert np.isfinite(m1["loss"])
    args2 = ps.build_argparser().parse_args(base + ["--resume"])
    args2.hier = "top"
    m2 = ps.train(args2)
    assert np.isfinite(m2["loss"])

@pytest.mark.slow
def test_gray2color_trainer_resume(tmp_path):
    """The adaptation-family trainers share the same periodic/last/best
    checkpoint layout (round-4 parity fix: bi/ir/gray2color/stargan_bi
    previously had no --ckpt_dir at all; the reference saves every epoch)."""
    from vqvae2_tpu.train import gray2color
    from vqvae2_tpu.train.reid import make_synthetic_sysu

    data = make_synthetic_sysu(str(tmp_path / "sysu"), n_ids=4, per_id=4,
                               h=48, w=24)
    base = ["--path", data, "--steps", "2", "--batch_size", "4",
            "--num_pos", "2", "--arch", "resnet18", "--log_every", "1",
            "--sample_every", "0", "--save_every", "1",
            "--ckpt_dir", str(tmp_path / "ckpt")]
    args = gray2color.build_argparser().parse_args(base)
    m1 = gray2color.train(args)
    assert np.isfinite(m1["loss"])
    ckpt = tmp_path / "ckpt"
    assert (ckpt / "last").is_dir() and (ckpt / "step_0000002").is_dir()
    assert (ckpt / "config.json").exists()

    args2 = gray2color.build_argparser().parse_args(base + ["--resume"])
    m2 = gray2color.train(args2)
    assert np.isfinite(m2["loss"])
    # resumed from a 2-step-trained state: loss must stay in the same regime
    assert abs(m2["loss"] - m1["loss"]) < 1.0


@pytest.mark.slow
def test_stargan_bi_trainer_resume_flags(tmp_path):
    """stargan_bi/bi/ir accept the same checkpoint flags (CLI contract)."""
    import importlib

    for mod in ("stargan_bi", "vqvae_deep_bi", "vqvae_deep_ir"):
        m = importlib.import_module(f"vqvae2_tpu.train.{mod}")
        args = m.build_argparser().parse_args(
            ["--ckpt_dir", "ck", "--save_every", "5", "--resume"])
        assert args.ckpt_dir == "ck" and args.save_every == 5 and args.resume
