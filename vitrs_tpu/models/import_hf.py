"""HuggingFace GPT-2 weight import into the canonical 16-tensor layout.

The reference's checkpoint loader expects llm.c's GPT-2 export (SURVEY.md
§2.6); this converter produces the same canonical tensors directly from a
`transformers` GPT-2 model, giving (a) a path for users with HF checkpoints
and (b) an independent cross-framework parity oracle: tests instantiate a
randomly-initialized torch GPT-2, convert, and require our JAX forward to
match its logits.

Layout notes: HF GPT-2 stores its projection weights as Conv1D — (C_in,
C_out) — while the canonical layout is (OC, C) row-major consumed as
y = x·Wᵀ (rusty_vit.rs:484-498), so every matmul weight transposes on the way
in.  Ordering of the packed qkv channels (Q|K|V thirds) is identical.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..config import ViTConfig


def convert_gpt2_state_dict(sd: Dict[str, "np.ndarray"], cfg: ViTConfig
                            ) -> Dict[str, np.ndarray]:
    """torch state_dict (or {name: ndarray}) -> canonical params pytree."""
    def get(name):
        t = sd[name]
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                          else t, np.float32)

    L = cfg.num_layers
    out = {
        "wte": get("transformer.wte.weight"),
        "wpe": get("transformer.wpe.weight"),
        "lnfw": get("transformer.ln_f.weight"),
        "lnfb": get("transformer.ln_f.bias"),
    }
    stack = {k: [] for k in ("ln1w", "ln1b", "qkvw", "qkvb", "attprojw",
                             "attprojb", "ln2w", "ln2b", "fcw", "fcb",
                             "fcprojw", "fcprojb")}
    for l in range(L):
        p = f"transformer.h.{l}."
        stack["ln1w"].append(get(p + "ln_1.weight"))
        stack["ln1b"].append(get(p + "ln_1.bias"))
        stack["qkvw"].append(get(p + "attn.c_attn.weight").T)     # (3C,C)
        stack["qkvb"].append(get(p + "attn.c_attn.bias"))
        stack["attprojw"].append(get(p + "attn.c_proj.weight").T)  # (C,C)
        stack["attprojb"].append(get(p + "attn.c_proj.bias"))
        stack["ln2w"].append(get(p + "ln_2.weight"))
        stack["ln2b"].append(get(p + "ln_2.bias"))
        stack["fcw"].append(get(p + "mlp.c_fc.weight").T)          # (4C,C)
        stack["fcb"].append(get(p + "mlp.c_fc.bias"))
        stack["fcprojw"].append(get(p + "mlp.c_proj.weight").T)    # (C,4C)
        stack["fcprojb"].append(get(p + "mlp.c_proj.bias"))
    for k, v in stack.items():
        out[k] = np.stack(v)
    # geometry sanity
    assert out["wte"].shape == (cfg.vocab_size, cfg.channels), out["wte"].shape
    assert out["qkvw"].shape == (L, 3 * cfg.channels, cfg.channels)
    return out


def config_from_hf(hf_config) -> ViTConfig:
    return ViTConfig(
        max_seq_len=hf_config.n_positions,
        vocab_size=hf_config.vocab_size,
        num_layers=hf_config.n_layer,
        num_heads=hf_config.n_head,
        channels=hf_config.n_embd,
        mode="gpt",
    ).validate()


def load_gpt2(model_name_or_path: str = "gpt2"):
    """Load a HF GPT-2 (local cache/dir only in zero-egress builds) and
    convert.  Returns (params, config)."""
    from transformers import GPT2LMHeadModel
    model = GPT2LMHeadModel.from_pretrained(model_name_or_path)
    cfg = config_from_hf(model.config)
    return convert_gpt2_state_dict(model.state_dict(), cfg), cfg
