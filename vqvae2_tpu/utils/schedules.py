"""LR / momentum schedules — functional optax equivalents of the reference
scheduler zoo (reference ``scheduler.py:6-354``).

Every schedule here is a pure ``step -> value`` function traceable under jit
(the TPU-native shape: the schedule is evaluated *inside* the compiled train
step, not by a host-side object mutating optimizer groups).

The flagship is :func:`cycle_schedule` + :func:`cycle_momentum_schedule`, the
fastai 1-cycle policy the trainers select with ``--sched cycle``
(reference ``CycleScheduler``, ``scheduler.py:251-320``): linear warmup
``lr_max/divider → lr_max`` over ``warmup_proportion·n_iter`` steps, then
cosine decay to ``lr_min/1e4``, with the Adam β₁ mirroring the cycle
(0.95 → 0.85 → 0.95).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import optax


def _anneal_linear(start, end, t):
    return start + t * (end - start)


def _anneal_cos(start, end, t):
    return end + (start - end) / 2 * (jnp.cos(jnp.pi * t) + 1)


def cycle_schedule(
    lr_max: float,
    n_iter: int,
    divider: float = 25.0,
    warmup_proportion: float = 0.3,
) -> optax.Schedule:
    """1-cycle LR (reference ``CycleScheduler`` lr phases, ``scheduler.py:264-273``)."""
    phase1 = int(n_iter * warmup_proportion)
    phase2 = n_iter - phase1
    lr_min = lr_max / divider

    def schedule(step):
        step = jnp.asarray(step)
        # reference Phase.step increments n first, so proportion = (n+1)/n_iter
        t1 = jnp.clip((step + 1) / max(phase1, 1), 0.0, 1.0)
        t2 = jnp.clip((step - phase1 + 1) / max(phase2, 1), 0.0, 1.0)
        warm = _anneal_linear(lr_min, lr_max, t1)
        decay = _anneal_cos(lr_max, lr_min / 1e4, t2)
        return jnp.where(step < phase1, warm, decay)

    return schedule


def cycle_momentum_schedule(
    n_iter: int,
    momentum: Tuple[float, float] = (0.95, 0.85),
    warmup_proportion: float = 0.3,
) -> optax.Schedule:
    """1-cycle β₁ (reference momentum phases, ``scheduler.py:277-283``)."""
    phase1 = int(n_iter * warmup_proportion)
    phase2 = n_iter - phase1
    m1, m2 = momentum

    def schedule(step):
        step = jnp.asarray(step)
        t1 = jnp.clip((step + 1) / max(phase1, 1), 0.0, 1.0)
        t2 = jnp.clip((step - phase1 + 1) / max(phase2, 1), 0.0, 1.0)
        down = _anneal_linear(m1, m2, t1)
        up = _anneal_cos(m2, m1, t2)
        return jnp.where(step < phase1, down, up)

    return schedule


def cycle_adam(
    lr_max: float,
    n_iter: int,
    momentum: Optional[Tuple[float, float]] = (0.95, 0.85),
    divider: float = 25.0,
    warmup_proportion: float = 0.3,
    b2: float = 0.999,
) -> optax.GradientTransformation:
    """Adam + full 1-cycle policy (lr and β₁ both scheduled), the optax
    equivalent of ``CycleScheduler(optimizer, ...)`` driving torch Adam betas
    (reference ``scheduler.py:298-306``)."""
    lr = cycle_schedule(lr_max, n_iter, divider, warmup_proportion)
    if momentum is None:
        return optax.adam(learning_rate=lr, b2=b2)
    b1 = cycle_momentum_schedule(n_iter, momentum, warmup_proportion)
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr, b1=b1, b2=b2)


# ---------------------------------------------------------------------------
# The rest of the zoo (reference scheduler.py:6-136, 157-218, 323-354)
# ---------------------------------------------------------------------------

def cosine_lr(lr_min: float, lr_max: float, step_size: int) -> optax.Schedule:
    """Repeating cosine (reference ``CosineLR``, ``scheduler.py:6-24``)."""
    def schedule(step):
        i = jnp.mod(jnp.asarray(step), step_size)
        return lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(i / step_size * jnp.pi))
    return schedule


def power_lr(lr_min: float, lr_max: float, warmup: int) -> optax.Schedule:
    """Linear warmup then inverse-sqrt decay (reference ``PowerLR``,
    ``scheduler.py:27-47``)."""
    def schedule(step):
        step = jnp.asarray(step)
        warm = lr_min + (lr_max - lr_min) / warmup * step
        decay = lr_max * jnp.power(jnp.maximum(step - warmup + 1, 1).astype(jnp.float32), -0.5)
        return jnp.where(step < warmup, warm, decay)
    return schedule


def sine_lr(lr_min: float, lr_max: float, step_size: int) -> optax.Schedule:
    """Repeating half-sine (reference ``SineLR``, ``scheduler.py:50-68``)."""
    def schedule(step):
        i = jnp.mod(jnp.asarray(step), step_size)
        return lr_min + (lr_max - lr_min) * jnp.sin(i / step_size * jnp.pi)
    return schedule


def linear_lr(lr_min: float, lr_max: float, warmup: int, step_size: int) -> optax.Schedule:
    """Hold then linear decay, repeating (reference ``LinearLR``,
    ``scheduler.py:71-94``)."""
    def schedule(step):
        i = jnp.mod(jnp.asarray(step), step_size)
        decay = lr_max + (i - warmup) * (lr_min - lr_max) / (step_size - warmup)
        return jnp.where(i < warmup, lr_max, decay)
    return schedule


def clr(lr_min: float, lr_max: float, step_size: int) -> optax.Schedule:
    """Triangular cyclical LR (reference ``CLR``, ``scheduler.py:97-115``)."""
    def schedule(step):
        e = jnp.asarray(step).astype(jnp.float32)
        cycle = jnp.floor(1 + e / (2 * step_size))
        x = jnp.abs(e / step_size - 2 * cycle + 1)
        return lr_min + (lr_max - lr_min) * jnp.maximum(0.0, 1 - x)
    return schedule


def noam_warmup(model_dim: int, factor: float = 1.0, warmup: int = 16000) -> optax.Schedule:
    """Noam/transformer warmup (reference ``Warmup``, ``scheduler.py:118-136``)."""
    def schedule(step):
        i = jnp.asarray(step).astype(jnp.float32) + 1  # reference pre-increments
        return factor * model_dim ** -0.5 * jnp.minimum(i ** -0.5, i * warmup ** -1.5)
    return schedule


def cycle_anneal(
    lr_max: float, lr_divider: float, cut_point: int, step_size: int
) -> optax.Schedule:
    """Triangular 1-cycle with final cut to lr_max/100/divider (reference
    ``CycleAnnealScheduler``, ``scheduler.py:157-218``)."""
    cycle_step = int(step_size * (1 - cut_point / 100) / 2)

    def schedule(step):
        i = jnp.mod(jnp.asarray(step), step_size).astype(jnp.float32)
        up = lr_max * (1 + (i / cycle_step) * (lr_divider - 1)) / lr_divider
        down_t = 1 - (i - cycle_step) / cycle_step
        down = lr_max * (1 + down_t * (lr_divider - 1)) / lr_divider
        tail_t = (i - 2 * cycle_step) / (step_size - 2 * cycle_step)
        tail = lr_max * (1 + tail_t * (1 - 100) / 100) / lr_divider
        return jnp.where(i > 2 * cycle_step, tail, jnp.where(i > cycle_step, down, up))

    return schedule


def lr_finder(lr_min: float, lr_max: float, step_size: int, linear: bool = False) -> optax.Schedule:
    """Exponential/linear LR sweep for range tests (reference ``LRFinder``,
    ``scheduler.py:323-346``); :class:`LRFinder` adds the loss recording."""
    ratio = lr_max / lr_min
    mult = (ratio / step_size) if linear else ratio ** (1 / step_size)

    def schedule(step):
        i = jnp.asarray(step).astype(jnp.float32)
        if linear:
            return lr_min + mult * i
        return lr_min * jnp.power(mult, i)

    return schedule


class LRFinder:
    """LR range test with per-step loss recording — the full reference
    ``LRFinder`` (``scheduler.py:323-354``): ``.schedule`` plugs into any
    optax optimizer, the host loop calls :meth:`record` with each step's
    loss, :meth:`save` writes the same ``lr,loss`` CSV, and :meth:`suggest`
    returns the LR at the steepest smoothed descent."""

    def __init__(self, lr_min: float, lr_max: float, step_size: int,
                 linear: bool = False, smooth: float = 0.3):
        self.schedule = lr_finder(lr_min, lr_max, step_size, linear)
        self.step_size = step_size
        self.smooth = smooth
        self.lrs: list = []
        self.losses: list = []
        self.smoothed: list = []

    def record(self, loss) -> None:
        self.lrs.append(float(self.schedule(len(self.losses))))
        loss = float(loss)
        prev = self.smoothed[-1] if self.smoothed else loss
        self.losses.append(loss)
        self.smoothed.append(self.smooth * loss + (1 - self.smooth) * prev
                             if len(self.losses) > 1 else loss)

    @property
    def diverged(self) -> bool:
        """Stop signal: EMA-smoothed loss blew past 4× its running minimum
        (same smoothing as :meth:`suggest` — one noisy raw step must not
        terminate the sweep)."""
        if len(self.smoothed) < 2:
            return False
        return self.smoothed[-1] > 4.0 * min(self.smoothed)

    def suggest(self) -> float:
        """LR at the steepest descent of the EMA-smoothed loss curve."""
        if len(self.losses) < 3:
            raise ValueError("record() more steps before suggest()")
        grads = np.diff(self.smoothed) / np.maximum(np.diff(self.lrs), 1e-12)
        return float(self.lrs[int(np.argmin(grads))])

    def save(self, filename: str) -> None:
        with open(filename, "w") as f:
            for lr, loss in zip(self.lrs, self.losses):
                f.write(f"{lr},{loss}\n")


def multi_step_lr(base_lr: float, milestones: Sequence[int], gamma: float = 0.1) -> optax.Schedule:
    """torch MultiStepLR equivalent (used by train_reid.py:256)."""
    ms = jnp.asarray(list(milestones))

    def schedule(step):
        n = jnp.sum(jnp.asarray(step) >= ms)
        return base_lr * jnp.power(gamma, n.astype(jnp.float32))

    return schedule


def stepped_reid_lr(base_lr: float) -> optax.Schedule:
    """The hand-stepped ReID decay (reference ``adjust_learning_rate``,
    ``train_vqvae_deep_bi.py:81-96``): ×1 until 20, ×0.1 until 60, ×0.01
    until 120, ×0.001 after — in epochs; pass epoch as the step."""
    def schedule(epoch):
        e = jnp.asarray(epoch)
        scale = jnp.where(e < 20, 1.0, jnp.where(e < 60, 0.1, jnp.where(e < 120, 0.01, 0.001)))
        return base_lr * scale
    return schedule
