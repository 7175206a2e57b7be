"""Cross-framework parity: our GPT path vs torch GPT-2 on identical weights.

A randomly-initialized `transformers` GPT-2 (no network needed) is converted
via models/import_hf; logits and loss must match torch's forward — an oracle
completely independent of our own NumPy reference implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vitrs_tpu.models import import_hf as IH
from vitrs_tpu.models import model as M


@pytest.fixture(scope="module")
def hf_model():
    cfg_hf = transformers.GPT2Config(
        vocab_size=211, n_positions=32, n_embd=48, n_layer=3, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    torch.manual_seed(0)
    model = transformers.GPT2LMHeadModel(cfg_hf).eval()
    return model


def test_logits_match_torch(hf_model):
    cfg = IH.config_from_hf(hf_model.config).replace(use_flash=False)
    params = IH.convert_gpt2_state_dict(hf_model.state_dict(), cfg)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, (2, 16))
    with torch.no_grad():
        want = hf_model(torch.tensor(tokens)).logits.numpy()
    got = np.asarray(M.gpt_forward(
        {k: jnp.asarray(v) for k, v in params.items()},
        jnp.asarray(tokens), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_loss_matches_torch(hf_model):
    cfg = IH.config_from_hf(hf_model.config).replace(use_flash=False)
    params = IH.convert_gpt2_state_dict(hf_model.state_dict(), cfg)
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.vocab_size, (2, 16))
    targets = rng.integers(0, cfg.vocab_size, (2, 16))
    with torch.no_grad():
        logits = hf_model(torch.tensor(tokens)).logits
        want = torch.nn.functional.cross_entropy(
            logits.reshape(-1, cfg.vocab_size), torch.tensor(targets).reshape(-1)
        ).item()
    got = float(M.gpt_loss({k: jnp.asarray(v) for k, v in params.items()},
                           jnp.asarray(tokens), jnp.asarray(targets), cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_gpt2_124m_geometry_roundtrip(hf_model):
    """Converter output must satisfy the canonical order/shape contract."""
    from vitrs_tpu import params as P
    cfg = IH.config_from_hf(hf_model.config)
    params = IH.convert_gpt2_state_dict(hf_model.state_dict(), cfg)
    shapes = P.param_shapes(cfg)
    for name in P.CANONICAL_16:
        assert params[name].shape == shapes[name], name


def test_export_roundtrips_import():
    """export_gpt2_state_dict must be the exact inverse of
    convert_gpt2_state_dict (bitwise array round-trip)."""
    import jax
    from vitrs_tpu import params as PRM
    from vitrs_tpu.config import get_config
    cfg = get_config("gpt-nano")
    params = jax.device_get(PRM.init_params(cfg, jax.random.PRNGKey(0)))
    sd = IH.export_gpt2_state_dict(params, cfg)
    back = IH.convert_gpt2_state_dict(sd, cfg)
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k], np.float32),
                                      back[k], err_msg=k)


def test_export_loads_into_torch_and_matches_logits():
    import jax
    from vitrs_tpu import params as PRM
    from vitrs_tpu.config import get_config
    cfg = get_config("gpt-nano", use_flash=False)
    params = jax.device_get(PRM.init_params(cfg, jax.random.PRNGKey(1)))
    sd = IH.export_gpt2_state_dict(params, cfg)

    hf_cfg = transformers.GPT2Config(
        n_positions=cfg.max_seq_len, vocab_size=cfg.vocab_size,
        n_layer=cfg.num_layers, n_head=cfg.num_heads, n_embd=cfg.channels,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    tm = transformers.GPT2LMHeadModel(hf_cfg)
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False)
    # HF keeps per-layer attn.bias causal-mask buffers; nothing else may miss
    assert all(".attn.bias" in k or ".attn.masked_bias" in k
               for k in missing), missing
    assert not unexpected, unexpected
    tm.eval()

    rng = np.random.default_rng(1)
    x = rng.integers(0, cfg.vocab_size, (2, 12))
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).logits.numpy()
    got = np.asarray(M.gpt_forward(
        {k: jnp.asarray(v) for k, v in params.items()}, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
