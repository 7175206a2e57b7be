"""Autoregressive generation with a KV cache (GPT mode).

The reference has no sampling/generation loop (SURVEY.md §3.5: 'No
sampling/generation loop exists in-repo'); its inference story is 'forward
without targets'.  This module supplies the serving path: a prefill pass that
populates per-layer K/V caches in one batched sweep, then a jit-compiled
`lax.scan` decode loop touching only one token per step — O(T) per token
instead of the O(T²) full recompute.

Cache layout: (L, B, Tmax, C) for K and V — the packed-C convention of the
qkv activations (head h at channels [h·D,(h+1)·D)), so decode attention
reads it with the same head slicing as the reference layout.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..config import ViTConfig
from ..ops import basic
from . import model as M


def _block_with_kv(x, p, cfg, k_cache, v_cache, pos):
    """One block step that reads/updates its (B, Tmax, C) cache slice.

    x: (B, S, C) — S = prompt length at prefill, 1 at decode.
    pos: starting position of x within the sequence (scalar).
    Math is the standard block (rusty_vit.rs:322-331) with attention masked
    to positions <= query position.
    """
    B, S, C = x.shape
    NH = cfg.num_heads
    D = C // NH
    Tmax = k_cache.shape[1]
    ln1 = basic.layernorm_cv(x, p["ln1w"], p["ln1b"])
    qkv = basic.linear(ln1, p["qkvw"], p["qkvb"])
    q, k, v = jnp.split(qkv, 3, axis=-1)                    # (B, S, C)
    k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, pos, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, pos, 0))

    # attention of q against the cache, causal w.r.t. absolute positions
    qh = q.reshape(B, S, NH, D).transpose(0, 2, 1, 3)       # (B, NH, S, D)
    kh = k_cache.reshape(B, Tmax, NH, D).transpose(0, 2, 1, 3)
    vh = v_cache.reshape(B, Tmax, NH, D).transpose(0, 2, 1, 3)
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
    s = jnp.einsum("bhsd,bhtd->bhst", qh, kh,
                   preferred_element_type=jnp.float32) * scale
    q_pos = pos + jnp.arange(S)[:, None]                    # (S, 1)
    t_pos = jnp.arange(Tmax)[None, :]                       # (1, Tmax)
    mask = t_pos <= q_pos                                   # causal + unfilled
    s = jnp.where(mask[None, None], s, -jnp.inf)
    att = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
    atty = jnp.einsum("bhst,bhtd->bhsd", att, vh,
                      preferred_element_type=jnp.float32).astype(x.dtype)
    atty = atty.transpose(0, 2, 1, 3).reshape(B, S, C)

    x = x + basic.linear(atty, p["attprojw"], p["attprojb"])
    ln2 = basic.layernorm_cv(x, p["ln2w"], p["ln2b"])
    fch_gelu = basic.gelu_cv(basic.linear(ln2, p["fcw"], p["fcb"]))
    x = x + basic.linear(fch_gelu, p["fcprojw"], p["fcprojb"])
    return x, k_cache, v_cache


def init_kv_cache(cfg: ViTConfig, B: int, Tmax: int):
    dtype = jnp.dtype(cfg.dtype)
    shape = (cfg.num_layers, B, Tmax, cfg.channels)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def forward_with_cache(params: Dict, tokens: jax.Array, caches, pos,
                       cfg: ViTConfig):
    """Run S tokens starting at `pos` through the stack, updating caches.
    Returns (logits (B, S, V), caches)."""
    k_caches, v_caches = caches
    dtype = jnp.dtype(cfg.dtype)
    S = tokens.shape[-1]
    x = (params["wte"][tokens]
         + jax.lax.dynamic_slice_in_dim(params["wpe"], pos, S, 0)[None]
         ).astype(dtype)
    blocks = {k: params[k] for k in M.BLOCK_KEYS}

    def step(x, layer):
        p, kc, vc = layer
        x, kc, vc = _block_with_kv(x, p, cfg, kc, vc, pos)
        return x, (kc, vc)

    x, (k_caches, v_caches) = jax.lax.scan(step, x,
                                           (blocks, k_caches, v_caches))
    lnf = basic.layernorm_cv(x, params["lnfw"], params["lnfb"])
    logits = basic.linear(lnf, params["wte"].astype(dtype), None)
    return logits.astype(jnp.float32), (k_caches, v_caches)


def _sample(logits, key, temperature, top_k):
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_k:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg", "max_new", "temperature",
                                             "top_k"))
def generate(params: Dict, prompt: jax.Array, cfg: ViTConfig, max_new: int,
             key: jax.Array, temperature: float = 1.0,
             top_k: int = 0) -> jax.Array:
    """prompt (B, T0) -> (B, T0 + max_new).  Prefill once, then scan decode."""
    B, T0 = prompt.shape
    Tmax = T0 + max_new
    assert Tmax <= cfg.max_seq_len
    caches = init_kv_cache(cfg, B, Tmax)
    key, first_key = jax.random.split(key)
    logits, caches = forward_with_cache(params, prompt, caches, 0, cfg)
    first = _sample(logits[:, -1, :], first_key, temperature, top_k)
    if max_new == 1:
        return jnp.concatenate([prompt, first[:, None]], axis=1)

    def decode(carry, step_key):
        tok, pos, caches = carry
        lg, caches = forward_with_cache(params, tok[:, None], caches, pos, cfg)
        nxt = _sample(lg[:, -1, :], step_key, temperature, top_k)
        return (nxt, pos + 1, caches), tok

    keys = jax.random.split(key, max_new - 1)
    (last, _, _), toks = jax.lax.scan(decode, (first, T0, caches), keys)
    gen = jnp.concatenate([toks.T, last[:, None]], axis=1)   # (B, max_new)
    return jnp.concatenate([prompt, gen], axis=1)
