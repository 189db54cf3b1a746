"""Autoregressive sampling for PixelSNAIL priors — fully on-device.

The reference samples with a host-side Python loop over all H·W positions,
re-forwarding the model over the rows seen so far each step and drawing from
``torch.multinomial`` on host (reference ``sample.py:12-24``).  On TPU that
pattern is dispatch-latency-bound (thousands of host→device round trips).

Here the entire raster scan is ONE compiled program: ``lax.fori_loop`` over
positions, full-grid forward per step (static shapes — XLA requirement),
``jax.random.categorical`` on device, ``dynamic_update`` of the code grid.
The condition features are computed once and cached across all steps
(the reference's ``cache['condition']`` semantics, ``pixelsnail.py:410-424``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vqvae2_tpu.models.pixelsnail import PixelSNAIL


@partial(jax.jit, static_argnames=("model", "shape", "batch", "temperature"))
def sample_prior(
    model: PixelSNAIL,
    variables,
    rng: jax.Array,
    batch: int,
    shape: Tuple[int, int],
    temperature: float = 1.0,
    condition: Optional[jax.Array] = None,
) -> jax.Array:
    """Draw ``(batch, H, W)`` int32 codes from the prior.

    Equivalent of reference ``sample_model`` (``sample.py:12-24``) — same
    raster order, temperature division, and categorical draw — but compiled
    into a single device program.
    """
    h, w = shape
    params = {"params": variables["params"]}

    cond_feat = None
    if condition is not None:
        cond_feat = model.apply(params, condition, method=model.compute_condition)

    def body(i, carry):
        codes, rng = carry
        logits = model.apply(params, codes, condition_features=cond_feat)
        flat = logits.reshape(batch, h * w, -1)
        step_logits = jax.lax.dynamic_slice_in_dim(flat, i, 1, axis=1)[:, 0]
        rng, sub = jax.random.split(rng)
        draw = jax.random.categorical(sub, step_logits / temperature, axis=-1)
        codes = codes.reshape(batch, h * w).at[:, i].set(
            draw.astype(jnp.int32)).reshape(batch, h, w)
        return codes, rng

    codes0 = jnp.zeros((batch, h, w), jnp.int32)
    codes, _ = jax.lax.fori_loop(0, h * w, body, (codes0, rng))
    return codes
