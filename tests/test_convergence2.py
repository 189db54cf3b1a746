"""Learning evidence for the adaptation / GAN / detection trainer families.

``test_convergence.py`` proves the stage-1/stage-2/ReID loops drive their
losses down; these do the same for the remaining trainer families whose
coverage was previously one-step-finite only: the deep adaptive
generator (reference ``train_vqvae_deep.py``), the StarGAN bidirectional
translator (``train_vqvae_deep_bi2.py``), SSD (``fashionSSD.py``) and
Mask R-CNN (``fashion.py``).  Each overfits a tiny FIXED batch and asserts
the objective actually FALLS — a sign-flipped gradient passes every
finiteness test in the repo but fails these.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def _id_images(rng, n_ids, num_pos, hw, noise=0.1):
    """Fixed identity templates + small per-draw noise, ImageNet-normalized
    scale (the space SYSU batches live in, data/sysu.py:15)."""
    templates = rng.normal(size=(n_ids, *hw, 3)).astype(np.float32)
    labels = np.repeat(np.arange(n_ids), num_pos)
    x = templates[labels] + noise * rng.normal(
        size=(len(labels), *hw, 3)).astype(np.float32)
    return x, labels.astype(np.int32)


@pytest.mark.slow
def test_deep_adaptive_learns_fixed_batch():
    """The deep adaptive two-optimizer step must drive its generator
    objective and reid CE far below init on a fixed batch (reference
    train_vqvae_deep.py).  Measured 80-step trajectory at this config:
    loss_gen 56.7 -> 0.91, latent 177 -> 0.09, loss_reid 0.80 -> 1e-4,
    recon 1.11 -> 0.73 (recon is a moving-target masked MSE — the mask
    comes from the evolving reid attention map — so it falls slowly)."""
    from vqvae2_tpu.models.adaptive import ModelAdaptive_Deep
    from vqvae2_tpu.train.vqvae_deep import (DeepState, _split_params,
                                             make_train_step)

    n_ids, num_pos, hw = 2, 2, (48, 16)  # H/8, W/8 even (deep geometry)
    rng = np.random.default_rng(0)
    rgb, labels = _id_images(rng, n_ids, num_pos, hw)
    ir, _ = _id_images(rng, n_ids, num_pos, hw)
    batch = {"rgb": jnp.asarray(rgb), "ir": jnp.asarray(ir),
             "label": jnp.asarray(labels)}

    model = ModelAdaptive_Deep(class_num=n_ids, arch="resnet18")
    tx_reid, tx_gen = optax.adam(1e-3), optax.adam(2e-3)
    probe = jnp.zeros((2, *hw, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        probe, method=model.init_probe)
    reid_params, gen_params = _split_params(variables["params"])
    state = DeepState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables.get("batch_stats", {}),
                      vq_stats=variables.get("vq_stats", {}),
                      opt_reid=tx_reid.init(reid_params),
                      opt_gen=tx_gen.init(gen_params))
    step = make_train_step(model, tx_reid, tx_gen, num_pos)

    key = jax.random.PRNGKey(2)
    gens, reids, recons, latents = [], [], [], []
    for _ in range(60):
        state, m = step(state, batch, key)
        gens.append(float(m["loss_gen"]))
        reids.append(float(m["loss_reid"]))
        recons.append(float(m["recon"]))
        latents.append(float(m["latent"]))
    assert all(np.isfinite(v[-1]) for v in (gens, reids, recons, latents))
    assert gens[-1] < 0.1 * gens[0], (gens[0], gens[-1])
    assert reids[-1] < 0.1 * reids[0], (reids[0], reids[-1])
    assert latents[-1] < 0.1 * latents[0], (latents[0], latents[-1])
    assert recons[-1] < 0.8 * recons[0], (recons[0], recons[-1])


@pytest.mark.slow
def test_stargan_discriminator_learns():
    """The StarGAN-v2 three-optimizer step must train its discriminator:
    D's real+fake BCE falls monotonically from ~2·ln2 (measured: 1.39 ->
    0.14 over 10 steps at the trainer-default LRs) while the R1 penalty
    stays finite.  The *generator* objective is deliberately not asserted:
    on a 4-image fixed batch the adversarial pressure overpowers the cycle
    term within a few steps (measured: cycle rises while D wins) — the
    reference config (train_vqvae_deep_bi2.py) relies on hundreds of
    epochs of real data for that balance, which is out of test budget."""
    from vqvae2_tpu.models.stargan import ModelStarGAN
    from vqvae2_tpu.train.stargan_bi import GanState, _split, make_train_step

    n_ids, num_pos, hw = 2, 2, (64, 64)
    rng = np.random.default_rng(0)
    rgb, labels = _id_images(rng, n_ids, num_pos, hw)
    ir, _ = _id_images(rng, n_ids, num_pos, hw)
    gray = np.repeat(rgb.mean(axis=-1, keepdims=True), 3, axis=-1)
    batch = {"gray": jnp.asarray(gray), "ir": jnp.asarray(ir),
             "aug_rgb": jnp.asarray(rgb), "aug_ir": jnp.asarray(ir),
             "label": jnp.asarray(labels)}

    model = ModelStarGAN(class_num=n_ids, arch="resnet18", img_size=64)
    # trainer defaults (stargan_bi.build_argparser): lr_F=0.1, lr=lr_disc=1e-4
    tx_reid = optax.sgd(0.1, momentum=0.9, nesterov=True)
    tx_gen, tx_disc = optax.adam(1e-4), optax.adam(1e-4)
    probe = jnp.zeros((2 * num_pos, *hw, 3), jnp.float32)

    def init_probe(module):
        feat, *_ = module.person_id(xRGB=probe, xIR=probe, modal=0,
                                    with_feature=True)
        fv, fi = jnp.split(feat, 2, axis=0)
        module.gen_1(probe, fi)
        module.gen_2(probe, fv)
        return module.discriminate(probe,
                                   jnp.zeros((probe.shape[0],), jnp.int32))

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        method=init_probe)
    reid_params, gen_params, disc_params = _split(variables["params"])
    state = GanState(step=jnp.zeros((), jnp.int32),
                     params=variables["params"],
                     batch_stats=variables.get("batch_stats", {}),
                     opt_reid=tx_reid.init(reid_params),
                     opt_gen=tx_gen.init(gen_params),
                     opt_disc=tx_disc.init(disc_params))
    step = make_train_step(model, tx_reid, tx_gen, tx_disc, num_pos)

    key = jax.random.PRNGKey(2)
    d_losses, r1s, cycles = [], [], []
    for _ in range(5):  # ~40 s/step on the 1-vCPU image — keep it tight
        state, m = step(state, batch, key)
        d_losses.append(float(m["d_real"]) + float(m["d_fake"]))
        r1s.append(float(m["r1"]))
        cycles.append(float(m["cycle"]))
    assert all(np.isfinite(v) for v in (d_losses[-1], r1s[-1], cycles[-1]))
    # D starts at the coin-flip BCE (~2·ln2 = 1.39 measured) and must beat
    # it decisively on the fixed batch (measured trajectory: 1.39 -> 0.79
    # by step 5, monotone)
    assert d_losses[-1] < 0.7 * d_losses[0], (d_losses[0], d_losses[-1])
    assert all(b < a for a, b in zip(d_losses, d_losses[1:])), d_losses


@pytest.mark.slow
def test_ssd_overfits_fixed_batch(tmp_path):
    """The SSD MultiBox objective must fall well below init on a fixed
    2-image batch (reference fashionSSD.py + ssd/loss.py)."""
    from vqvae2_tpu.detection import boxes as B
    from vqvae2_tpu.detection.data import (CocoDetectionDataset,
                                           make_synthetic_coco)
    from vqvae2_tpu.detection.ssd import SSD300
    from vqvae2_tpu.train.detection import DetState, make_train_step

    img_dir, ann = make_synthetic_coco(str(tmp_path), n=2, size=300,
                                       n_classes=3)
    dataset = CocoDetectionDataset(img_dir, ann, size=300)
    imgs, gt_boxes, gt_labels, _ = next(iter(dataset.batches(2,
                                                             shuffle=False)))
    imgs, gt_boxes, gt_labels = map(jnp.asarray, (imgs, gt_boxes, gt_labels))

    model = SSD300(num_classes=dataset.num_classes, arch="resnet18")
    tx = optax.adam(1e-3)
    dboxes = B.default_boxes_ssd300(fig_size=300)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 300, 300, 3)))
    state = DetState(step=jnp.zeros((), jnp.int32),
                     params=variables["params"],
                     batch_stats=variables["batch_stats"],
                     opt_state=tx.init(variables["params"]))
    step = make_train_step(model, tx, dboxes)

    losses = []
    for _ in range(40):
        state, loss = step(state, imgs, gt_boxes, gt_labels)
        losses.append(float(loss))
    assert np.isfinite(losses[-1])
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


@pytest.mark.slow
def test_maskrcnn_loss_falls(tmp_path):
    """The Mask R-CNN multi-task loss (RPN + RoI + mask) must fall on a
    fixed batch (reference fashion.py's torchvision training loop)."""
    from vqvae2_tpu.detection import mask_rcnn as M
    from vqvae2_tpu.detection.data import (CocoDetectionDataset,
                                           make_synthetic_coco)
    from vqvae2_tpu.train.maskrcnn import MRState, make_train_step

    img_dir, ann = make_synthetic_coco(str(tmp_path), n=2, size=64,
                                       n_classes=3, with_masks=True)
    dataset = CocoDetectionDataset(img_dir, ann, size=64, with_masks=True)
    imgs, gt_boxes, gt_labels, _, gt_masks = next(iter(
        dataset.batches(2, shuffle=False, with_masks=True)))
    imgs, gt_boxes, gt_labels, gt_masks = map(
        jnp.asarray, (imgs, gt_boxes, gt_labels, gt_masks))

    model = M.MaskRCNN(num_classes=dataset.num_classes, img_size=64,
                       num_proposals=16, arch="resnet18")
    anchors = M.generate_anchors(64)
    tx = optax.adam(1e-4)  # the trainer default; 1e-3 diverges (the
    # RPN->proposal->RoI feedback makes the objective non-stationary)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    p2 = jnp.zeros((1, 16, 16, 128))
    rois = jnp.zeros((1, 16, 4))
    roi_vars = model.init(jax.random.PRNGKey(1), p2, rois,
                          method=model.roi_outputs)
    params = {**roi_vars["params"], **variables["params"]}
    state = MRState(step=jnp.zeros((), jnp.int32), params=params,
                    batch_stats=variables.get("batch_stats", {}),
                    opt_state=tx.init(params))
    step = make_train_step(model, tx, anchors)

    losses, rpn_cls = [], []
    for _ in range(60):
        state, m = step(state, imgs, gt_boxes, gt_labels, gt_masks)
        losses.append(float(m["loss"]))
        rpn_cls.append(float(m["rpn_cls"]))
    assert np.isfinite(losses[-1])
    # the total spikes whenever fresh proposals switch the RoI terms on
    # (measured trajectory: 7.8 -> ~0.06 with transient 9.2/6.1 spikes), so
    # assert on the floor of the tail plus the monotone RPN objectness CE
    assert min(losses[-10:]) < 0.1 * losses[0], (losses[0], losses[-10:])
    assert rpn_cls[-1] < 0.2 * rpn_cls[0], (rpn_cls[0], rpn_cls[-1])
