"""MAE + CLIP variant tests (BASELINE.json configs[4])."""

import jax
import jax.numpy as jnp
import numpy as np

from vitrs_tpu.config import get_config
from vitrs_tpu.models import clip as CLIP
from vitrs_tpu.models import mae as MAE
from vitrs_tpu import checkpoint_tree as CT

CFG = get_config("vit-tiny-4-cifar10", use_flash=False).replace(
    num_layers=2, channels=32, num_heads=2)


def _images(B=4, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, 32, 32, 3), dtype=np.float32))


def test_random_masking_structure():
    key = jax.random.PRNGKey(0)
    keep, restore, mask = MAE.random_masking(key, 3, 64, 0.75)
    assert keep.shape == (3, 16)
    assert mask.shape == (3, 64)
    np.testing.assert_allclose(np.asarray(mask).sum(1), 48)   # 75% masked
    # kept positions are exactly the unmasked ones
    m = np.asarray(mask)
    for b in range(3):
        assert set(np.asarray(keep)[b]) == set(np.where(m[b] == 0)[0])


def test_mae_forward_shapes_and_loss():
    params = MAE.init_mae_params(CFG, jax.random.PRNGKey(0))
    imgs = _images()
    rng = jax.random.PRNGKey(1)
    pred, target, mask = MAE.mae_forward(params, imgs, CFG, rng)
    N = CFG.num_patches
    pd = CFG.patch_size ** 2 * 3
    assert pred.shape == (4, N, pd) and target.shape == (4, N, pd)
    loss = MAE.mae_loss(params, imgs, CFG, rng)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_mae_training_reduces_reconstruction_loss():
    params = MAE.init_mae_params(CFG, jax.random.PRNGKey(0))
    imgs = _images(8)

    @jax.jit
    def step(p, rng):
        loss, g = jax.value_and_grad(MAE.mae_loss)(p, imgs, CFG, rng)
        p = jax.tree_util.tree_map(lambda a, b: a - 1e-3 * b, p, g)
        return p, loss

    losses = []
    for i in range(8):
        params, loss = step(params, jax.random.PRNGKey(100 + i))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_mae_reconstruction_pastes_visible_patches():
    params = MAE.init_mae_params(CFG, jax.random.PRNGKey(0))
    imgs = _images(2)
    rng = jax.random.PRNGKey(3)
    recon = MAE.reconstruct(params, imgs, CFG, rng)
    assert recon.shape == imgs.shape
    _, _, mask = MAE.mae_forward(params, imgs, CFG, rng)
    # at least the visible patches must match the input exactly
    from vitrs_tpu.ops.basic import patchify
    pr = np.asarray(patchify(recon, CFG.patch_size))
    pi = np.asarray(patchify(imgs, CFG.patch_size))
    vis = np.asarray(mask) == 0
    np.testing.assert_allclose(pr[vis], pi[vis], atol=1e-6)


def test_mae_checkpoint_tree_roundtrip(tmp_path):
    params = MAE.init_mae_params(CFG, jax.random.PRNGKey(0))
    path = str(tmp_path / "mae.bin")
    CT.save_tree(path, jax.device_get(params), meta={"mask_ratio": 0.75})
    tree, meta = CT.load_tree(path)
    assert meta["mask_ratio"] == 0.75
    np.testing.assert_array_equal(tree["decoder"]["predw"],
                                  np.asarray(params["decoder"]["predw"]))
    np.testing.assert_array_equal(tree["encoder"]["qkvw"],
                                  np.asarray(params["encoder"]["qkvw"]))


def test_clip_embeddings_normalized():
    params = CLIP.init_clip_params(CFG, jax.random.PRNGKey(0))
    emb = CLIP.image_embed(params, _images(), CFG)
    assert emb.shape == (4, CFG.num_classes)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0,
                               rtol=1e-5)


def test_clip_contrastive_loss_prefers_aligned_pairs():
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((8, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    scale = jnp.asarray(np.log(1 / 0.07), jnp.float32)
    aligned = float(CLIP.contrastive_loss(jnp.asarray(emb), jnp.asarray(emb),
                                          scale))
    shuffled = float(CLIP.contrastive_loss(
        jnp.asarray(emb), jnp.asarray(emb[::-1].copy()), scale))
    assert aligned < shuffled


def test_clip_training_aligns_image_text():
    params = CLIP.init_clip_params(CFG, jax.random.PRNGKey(0))
    imgs = _images(8)
    txt = jnp.asarray(np.random.default_rng(1).standard_normal((8, 10)),
                      jnp.float32)

    @jax.jit
    def step(p):
        loss, g = jax.value_and_grad(CLIP.clip_loss)(p, imgs, txt, CFG)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-2 * b, p, g), loss

    losses = []
    for _ in range(6):
        params, loss = step(params)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # zero-shot path runs
    logits = CLIP.zero_shot_classify(params, imgs, txt, CFG)
    assert logits.shape == (8, 8)


def test_mae_encoder_transfers_to_supervised(tmp_path):
    """The pretrain->finetune seam: MAE encoder saved in the reference
    checkpoint format warm-starts the supervised train loop."""
    import os
    from vitrs_tpu import checkpoint as C
    from vitrs_tpu.train.loop import TrainConfig, train

    params = MAE.init_mae_params(CFG, jax.random.PRNGKey(0))
    enc_path = str(tmp_path / "encoder.bin")
    C.save_checkpoint(enc_path, jax.device_get(params["encoder"]), CFG,
                      step=7, seed=0)
    wd = str(tmp_path / "ft")
    summary = train(TrainConfig(
        preset="vit-tiny-4-cifar10", dataset="cifar10", steps=4,
        batch_size=16, lr=1e-3, warmup=1, dtype="float32", log_every=2,
        ckpt_every=4, workdir=wd, seed=1, init_ckpt=enc_path,
        model_overrides=dict(num_layers=CFG.num_layers,
                             channels=CFG.channels, num_heads=CFG.num_heads,
                             use_flash=False)))
    assert np.isfinite(summary["final_loss"])
    # fine-tune started from the pretrained weights: first checkpoint's wte
    # (untouched by the vision path) must equal the encoder export's
    p2, _, _ = C.load_checkpoint(os.path.join(wd, "ckpt_00000004.bin"))
    # compare a tensor with zero gradient in vit mode: wte (unused by the
    # vision forward, only weight-decayed during the 4 finetune steps)
    got = p2["wte"]
    want = np.asarray(params["encoder"]["wte"])
    decay_bound = np.abs(want).max() * 0.01 + 1e-6
    assert np.abs(got - want).max() < decay_bound
