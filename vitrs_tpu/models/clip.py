"""CLIP image tower + contrastive loss (BASELINE.json configs[4]:
'CLIP ViT-L/14 image tower').

The image tower is the standard ViT trunk with an L2-normalized linear
projection to the shared embedding space (the `clip-l-14` preset maps
channels 1024 -> 768-dim embeddings via the head tensors).  The text side is
out of scope for the image-framework parity target; `contrastive_loss` takes
any batch of text/label embeddings (B, E) — from a text encoder or a learned
label-embedding table — and computes the symmetric InfoNCE objective with a
learnable log temperature, which is the complete CLIP training objective from
the image side.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import ViTConfig
from ..ops import basic
from . import model as M


def init_clip_params(cfg: ViTConfig, key: jax.Array,
                     init_temp: float = 0.07) -> Dict:
    from .. import params as P
    params = P.init_params(cfg, key)
    params["logit_scale"] = jnp.asarray(jnp.log(1.0 / init_temp), jnp.float32)
    return params


def image_embed(params: Dict, images: jax.Array, cfg: ViTConfig) -> jax.Array:
    """(B, H, W, C) -> L2-normalized (B, E) embeddings.  Projection = the
    head tensors (headw: (E, channels))."""
    x = M.vit_encode(images, params, cfg)
    x = M.transformer(x, params, cfg, causal=False)
    lnf = basic.layernorm_cv(x, params["lnfw"], params["lnfb"])
    pooled = lnf[:, 0, :] if cfg.pool == "cls" else jnp.mean(lnf, axis=1)
    emb = basic.linear(pooled, params["headw"], params["headb"])
    emb = emb.astype(jnp.float32)
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)


def contrastive_loss(img_emb: jax.Array, txt_emb: jax.Array,
                     logit_scale: jax.Array) -> jax.Array:
    """Symmetric InfoNCE over in-batch negatives; diagonal = positives."""
    txt_emb = txt_emb / jnp.linalg.norm(txt_emb, axis=-1, keepdims=True)
    scale = jnp.exp(jnp.clip(logit_scale, max=jnp.log(100.0)))
    logits = scale * img_emb @ txt_emb.T                     # (B, B)
    labels = jnp.arange(logits.shape[0])
    li = basic.cross_entropy_from_logits(logits, labels)
    lt = basic.cross_entropy_from_logits(logits.T, labels)
    return 0.5 * (jnp.mean(li) + jnp.mean(lt))


def clip_loss(params: Dict, images: jax.Array, txt_emb: jax.Array,
              cfg: ViTConfig) -> jax.Array:
    emb = image_embed(params, images, cfg)
    return contrastive_loss(emb, txt_emb, params["logit_scale"])


def zero_shot_classify(params: Dict, images: jax.Array,
                       class_embs: jax.Array, cfg: ViTConfig) -> jax.Array:
    """Cosine-similarity logits against per-class embedding prototypes."""
    emb = image_embed(params, images, cfg)
    protos = class_embs / jnp.linalg.norm(class_embs, axis=-1, keepdims=True)
    return emb @ protos.T
