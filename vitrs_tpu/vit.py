"""The flat, llm.c-spirit model API.

Preserves the reference's five-call surface (SURVEY.md §3.4):
    build_from_checkpoint / from_config   (rusty_vit.rs:79)
    forward(inputs, targets) -> mean_loss (rusty_vit.rs:269)
    backward()                             (rusty_vit.rs:354)
    optimizer_step(lr)                     (train_vit.rs:737)
    save_checkpoint / load_checkpoint      (train_vit.rs:715-735, completed)

plus `train_step`, the production fused path: one jit-compiled program doing
forward + backward + AdamW update in a single device launch.

Semantics kept from the reference:
  * forward with no targets is inference mode and sets mean_loss = -1.0
    (rusty_vit.rs:348-350);
  * grads accumulate with += across backward() calls and must be cleared with
    zero_grad() between steps (rusty_vit.rs:436,441 — the llm.c contract);
  * optimizer state m/v are flat f32 vectors of num_parameters
    (train_vit.rs:73-74).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ViTConfig, get_config
from . import checkpoint as ckpt_io
from . import params as P
from .models import model as M
from .ops import optimizer as opt


class ViT:
    def __init__(self, cfg: ViTConfig, params: Dict[str, jax.Array],
                 step: int = 0, seed: int = 0,
                 m: Optional[np.ndarray] = None, v: Optional[np.ndarray] = None):
        self.config = cfg.validate()
        self.params = params
        n = P.num_parameters(cfg)
        self.num_parameters = n
        # optimizer state lives as a tree mirroring params (no flatten cost
        # on the hot path); the canonical flat layout is the *serialization*
        zeros = lambda: jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params)
        self.m = zeros() if m is None else P.unflatten_params(
            jnp.asarray(m, jnp.float32), cfg)
        self.v = zeros() if v is None else P.unflatten_params(
            jnp.asarray(v, jnp.float32), cfg)
        self.step = step
        self.seed = seed
        self.grads: Optional[Dict[str, jax.Array]] = None
        self.mean_loss = -1.0
        self.logits = None
        self._inputs = None
        self._targets = None
        self._build_jit()

    # -- construction -------------------------------------------------------

    @classmethod
    def from_config(cls, cfg_or_name, seed: int = 0, scheme: str = "production",
                    **overrides) -> "ViT":
        cfg = (get_config(cfg_or_name, **overrides)
               if isinstance(cfg_or_name, str) else cfg_or_name.replace(**overrides))
        params = P.init_params(cfg, jax.random.PRNGKey(seed), scheme=scheme)
        return cls(cfg, params, seed=seed)

    @classmethod
    def build_from_checkpoint(cls, path: str, **overrides) -> "ViT":
        """Config comes from the file header — the reference's contract
        (train_vit.rs:94-113: the checkpoint is the config source of truth)."""
        np_params, cfg, extras = ckpt_io.load_checkpoint(path)
        if overrides:
            cfg = cfg.replace(**overrides).validate()
        params = {k: jnp.asarray(val) for k, val in np_params.items()}
        return cls(cfg, params, step=extras["step"], seed=extras["seed"],
                   m=extras["m"], v=extras["v"])

    # -- jit plumbing --------------------------------------------------------

    def _build_jit(self):
        cfg = self.config

        def _loss(params, inputs, targets):
            return M.loss_fn(params, inputs, targets, cfg)

        def _fwd_logits(params, inputs):
            if cfg.mode == "vit":
                return M.vit_forward(params, inputs, cfg, train=False)
            return M.gpt_forward(params, inputs, cfg)

        self._jit_loss = jax.jit(_loss)
        self._jit_logits = jax.jit(_fwd_logits)
        self._jit_fwd_loss = jax.jit(
            lambda params, inputs, targets: M.forward_with_loss(
                params, inputs, targets, cfg))
        self._jit_grad = jax.jit(jax.value_and_grad(_loss))

        def _train_step(params, m, v, inputs, targets, step, lr, wd):
            loss, grads = jax.value_and_grad(_loss)(params, inputs, targets)
            params, m, v = opt.adamw_tree(params, grads, m, v, step, lr,
                                          weight_decay=wd)
            return params, m, v, loss

        self._jit_train_step = jax.jit(_train_step, donate_argnums=(0, 1, 2))

    # -- the reference's five-call API ---------------------------------------

    def forward(self, inputs, targets=None) -> float:
        """Populates self.logits; returns mean loss, or -1.0 in inference mode
        (no targets), matching rusty_vit.rs:348-350."""
        inputs = jnp.asarray(inputs)
        self._inputs = inputs
        self._targets = None if targets is None else jnp.asarray(targets)
        if targets is None:
            self.logits = self._jit_logits(self.params, inputs)
            self.mean_loss = -1.0
        else:
            # one compiled program fills both, like the reference's one pass
            self.logits, loss = self._jit_fwd_loss(self.params, inputs,
                                                   self._targets)
            self.mean_loss = float(loss)
        return self.mean_loss

    def zero_grad(self):
        self.grads = None

    def backward(self) -> Dict[str, jax.Array]:
        """Gradients at the last forward's (inputs, targets); accumulates +=
        into self.grads like the reference's arena (zero_grad to clear)."""
        assert self._targets is not None, "backward requires a forward with targets"
        loss, grads = self._jit_grad(self.params, self._inputs, self._targets)
        self.mean_loss = float(loss)
        if self.grads is None:
            self.grads = grads
        else:
            self.grads = jax.tree_util.tree_map(jnp.add, self.grads, grads)
        return self.grads

    def optimizer_step(self, lr: float, optimizer: str = "adamw",
                       weight_decay: float = 0.0):
        assert self.grads is not None, "call backward() first"
        cfg = self.config
        if optimizer == "sgd":
            # reference-as-written update over the flat arena
            # (train_vit.rs:737-743)
            flat_p = opt.sgd_step(P.flatten_params(self.params, cfg),
                                  P.flatten_params(self.grads, cfg), lr)
            self.params = P.unflatten_params(flat_p, cfg)
        else:
            self.step += 1
            self.params, self.m, self.v = opt.adamw_tree(
                self.params, self.grads, self.m, self.v,
                jnp.asarray(self.step, jnp.int32), jnp.asarray(lr, jnp.float32),
                weight_decay=weight_decay)

    # -- fused production path ------------------------------------------------

    def train_step(self, inputs, targets, lr: float,
                   weight_decay: float = 0.0) -> float:
        """forward+backward+AdamW in one compiled program (one device launch)."""
        self.step += 1
        self.params, self.m, self.v, loss = self._jit_train_step(
            self.params, self.m, self.v, jnp.asarray(inputs),
            jnp.asarray(targets), jnp.asarray(self.step, jnp.int32),
            jnp.asarray(lr, jnp.float32), jnp.asarray(weight_decay, jnp.float32))
        self.mean_loss = float(loss)
        return self.mean_loss

    # -- checkpoint ------------------------------------------------------------

    def save_checkpoint(self, path: str, with_opt: bool = True, cursor: int = 0):
        cfg = self.config
        ckpt_io.save_checkpoint(
            path, jax.device_get(self.params), cfg,
            m=np.asarray(P.flatten_params(self.m, cfg)) if with_opt else None,
            v=np.asarray(P.flatten_params(self.v, cfg)) if with_opt else None,
            step=self.step, seed=self.seed, cursor=cursor)

    def load_checkpoint(self, path: str):
        np_params, cfg, extras = ckpt_io.load_checkpoint(path, self.config)
        self.params = {k: jnp.asarray(v) for k, v in np_params.items()}
        self.step = extras["step"]
        if extras["m"] is not None:
            self.m = P.unflatten_params(jnp.asarray(extras["m"]), cfg)
            self.v = P.unflatten_params(jnp.asarray(extras["v"]), cfg)
