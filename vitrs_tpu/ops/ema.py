"""Exponential moving average of parameters (Polyak averaging) — the eval
weights used by standard ViT/MAE training recipes."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_ema(params):
    return jax.tree_util.tree_map(lambda p: p.astype(jnp.float32), params)


def update_ema(ema, params, decay: float = 0.9999):
    """ema <- decay*ema + (1-decay)*params, in fp32."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p.astype(jnp.float32),
        ema, params)


def ema_params(ema, like):
    """Cast the EMA tree back to the model's parameter dtypes for eval."""
    return jax.tree_util.tree_map(lambda e, p: e.astype(p.dtype), ema, like)
