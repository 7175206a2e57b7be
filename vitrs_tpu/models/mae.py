"""MAE masked-patch pretraining (BASELINE.json configs[4]: '75% mask').

The random patch masking slots in at the reference's undefined-encoder seam
(SURVEY.md §2.4): visible patches are gathered *after* pos-embed add and only
they flow through the encoder — at 75% mask the encoder sees 4x fewer tokens,
which is where MAE's pretrain speedup comes from.  A light decoder (narrower,
shallower transformer) reconstructs pixel values for all patches; the loss is
MSE on masked patches only, with per-patch pixel normalization (He et al.'s
`norm_pix_loss`).

Parameters: {"encoder": standard ViT pytree (params.py), "decoder": own
pytree}.  Pretrained encoders save in the standard reference-compatible
format; full MAE state uses checkpoint_tree.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ViTConfig
from ..ops import basic
from . import model as M


def decoder_config(cfg: ViTConfig, width: int = 0, depth: int = 0,
                   heads: int = 0) -> ViTConfig:
    """MAE decoder geometry: default 512x8 for L-sized encoders, scaled-down
    otherwise."""
    width = width or min(512, cfg.channels)
    depth = depth or (8 if cfg.channels >= 1024 else 4)
    heads = heads or max(1, width // 64)
    return cfg.replace(channels=width, num_layers=depth, num_heads=heads)


def init_decoder_params(cfg: ViTConfig, dcfg: ViTConfig,
                        key: jax.Array) -> Dict[str, jax.Array]:
    from .. import params as P
    k1, k2, k3, k4 = jax.random.split(key, 4)
    Dw = dcfg.channels
    N = cfg.num_patches
    patch_dim = cfg.patch_size ** 2 * cfg.in_chans
    blocks = {k: v for k, v in P.init_params(dcfg, k1).items()
              if k in M.BLOCK_KEYS}
    return {
        **blocks,
        "embw": jax.random.normal(k2, (Dw, cfg.channels)) * 0.02,
        "embb": jnp.zeros(Dw),
        "mask_token": jnp.zeros((1, 1, Dw)),
        "wpe": jax.random.normal(k3, (N, Dw)) * 0.02,
        "lnfw": jnp.ones(Dw), "lnfb": jnp.zeros(Dw),
        "predw": jax.random.normal(k4, (patch_dim, Dw)) * 0.02,
        "predb": jnp.zeros(patch_dim),
    }


def init_mae_params(cfg: ViTConfig, key: jax.Array) -> Dict:
    from .. import params as P
    k_enc, k_dec = jax.random.split(key)
    return {"encoder": P.init_params(cfg, k_enc),
            "decoder": init_decoder_params(cfg, decoder_config(cfg), k_dec)}


def random_masking(key: jax.Array, B: int, N: int, mask_ratio: float
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-example random patch split.  Returns (keep_ids (B,K), restore_ids
    (B,N), mask (B,N) with 1 = masked).  Argsort of uniform noise — the
    standard shuffle that jit-compiles to a static shape."""
    K = max(1, int(N * (1.0 - mask_ratio)))
    noise = jax.random.uniform(key, (B, N))
    shuffle = jnp.argsort(noise, axis=1)
    keep_ids = shuffle[:, :K]
    restore = jnp.argsort(shuffle, axis=1)
    mask = jnp.ones((B, N)).at[:, :K].set(0.0)
    mask = jnp.take_along_axis(mask, restore, axis=1)
    return keep_ids, restore, mask


def _infer_decoder_config(cfg: ViTConfig, dec: Dict) -> ViTConfig:
    """Recover decoder geometry FROM the decoder params so a decoder built
    with custom width/depth via init_decoder_params can't silently mismatch
    at forward time (round-1 re-derived defaults here).  Custom head counts
    still need an explicit dcfg argument."""
    width = int(dec["lnfw"].shape[0])
    depth = int(dec["ln1w"].shape[0])          # stacked-L leading dim
    return decoder_config(cfg, width=width, depth=depth)


def mae_forward(params: Dict, images: jax.Array, cfg: ViTConfig,
                rng: jax.Array, mask_ratio: float = 0.75,
                dcfg: ViTConfig = None
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (pred (B,N,patch_dim), target (B,N,patch_dim), mask (B,N))."""
    enc, dec = params["encoder"], params["decoder"]
    if dcfg is None:
        dcfg = _infer_decoder_config(cfg, dec)
    if (int(dec["lnfw"].shape[0]) != dcfg.channels
            or int(dec["ln1w"].shape[0]) != dcfg.num_layers):
        raise ValueError(
            f"decoder params geometry ({int(dec['lnfw'].shape[0])}w x "
            f"{int(dec['ln1w'].shape[0])}L) does not match decoder config "
            f"({dcfg.channels}w x {dcfg.num_layers}L)")
    B = images.shape[0]
    N = cfg.num_patches
    keep_ids, restore, mask = random_masking(rng, B, N, mask_ratio)

    # ---- encoder on visible patches only (+ CLS if configured) ----
    x = M.vit_encode(images, enc, cfg, keep_ids=keep_ids)
    x = M.transformer(x, enc, cfg, causal=False)
    x = basic.layernorm_cv(x, enc["lnfw"], enc["lnfb"])

    # ---- decoder over the full token set ----
    y = basic.linear(x, dec["embw"], dec["embb"])            # (B, 1+K, Dw)
    n_prefix = 1 if cfg.pool == "cls" else 0
    cls_tok, vis = (y[:, :n_prefix], y[:, n_prefix:]) if n_prefix else (None, y)
    K = vis.shape[1]
    Dw = vis.shape[-1]
    mask_tok = jnp.broadcast_to(dec["mask_token"].astype(vis.dtype),
                                (B, N - K, Dw))
    full = jnp.concatenate([vis, mask_tok], axis=1)          # shuffled order
    full = jnp.take_along_axis(full, restore[..., None], axis=1)
    full = full + dec["wpe"][None].astype(full.dtype)
    if cls_tok is not None:
        full = jnp.concatenate([cls_tok, full], axis=1)
    z = M.transformer(full, dec, dcfg, causal=False)
    z = basic.layernorm_cv(z, dec["lnfw"], dec["lnfb"])
    if n_prefix:
        z = z[:, n_prefix:]
    pred = basic.linear(z, dec["predw"], dec["predb"])       # (B, N, P^2*C)

    target = basic.patchify(images, cfg.patch_size)
    return pred.astype(jnp.float32), target.astype(jnp.float32), mask


def mae_loss(params: Dict, images: jax.Array, cfg: ViTConfig, rng: jax.Array,
             mask_ratio: float = 0.75, norm_pix: bool = True,
             dcfg: ViTConfig = None) -> jax.Array:
    """MSE on masked patches only; targets per-patch normalized."""
    pred, target, mask = mae_forward(params, images, cfg, rng, mask_ratio,
                                     dcfg=dcfg)
    if norm_pix:
        mu = target.mean(-1, keepdims=True)
        var = target.var(-1, keepdims=True)
        target = (target - mu) / jnp.sqrt(var + 1e-6)
    per_patch = jnp.mean((pred - target) ** 2, axis=-1)      # (B, N)
    return jnp.sum(per_patch * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def reconstruct(params: Dict, images: jax.Array, cfg: ViTConfig,
                rng: jax.Array, mask_ratio: float = 0.75,
                dcfg: ViTConfig = None) -> jax.Array:
    """Full-image reconstruction (visible patches pasted back) for visual
    inspection."""
    pred, target, mask = mae_forward(params, images, cfg, rng, mask_ratio,
                                     dcfg=dcfg)
    mixed = jnp.where(mask[..., None] > 0, pred, target)
    return basic.unpatchify(mixed, cfg.patch_size, cfg.img_size, cfg.in_chans)
