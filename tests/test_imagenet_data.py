"""ImageNet-scale data path (VERDICT r1 missing #1): shard round-trip, native
JPEG decode, RandomResizedCrop/eval transforms, streaming resume, RandAugment,
and the device-side mixup step."""

import io
import os

import numpy as np
import pytest

from vitrs_tpu.data import imagenet as IN
from vitrs_tpu.data.datasets import synthetic_dataset


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("shards"))
    IN.build_synthetic_shards(d, n_shards=3, per_shard=40, img_size=64,
                              num_classes=10, seed=0)
    IN.build_synthetic_shards(d, n_shards=1, per_shard=24, img_size=64,
                              num_classes=10, seed=9, split="val")
    return d


def test_shard_roundtrip(tmp_path):
    from PIL import Image
    ds = synthetic_dataset(n=5, img_size=32, seed=3)
    blobs = []
    for i in range(5):
        bio = io.BytesIO()
        Image.fromarray(ds.images[i]).save(bio, format="JPEG", quality=95)
        blobs.append(bio.getvalue())
    path = str(tmp_path / "x.vshard")
    IN.write_shard(path, blobs, list(ds.labels[:5]))
    sh = IN.Shard(path)
    assert sh.n == 5
    np.testing.assert_array_equal(sh.labels, ds.labels[:5].astype(np.int32))
    for i in range(5):
        assert sh.blob(i) == blobs[i]         # byte-exact blob round-trip


def test_shard_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.vshard")
    with open(p, "wb") as f:
        f.write(b"NOTASHARDxxxx")
    with pytest.raises(ValueError, match="not a vshard"):
        IN.Shard(p)


def test_native_decode_matches_pil():
    """Full-res native decode vs PIL: both are libjpeg-turbo, so the RGB
    output should agree exactly (same IDCT)."""
    if not IN.native_available():
        pytest.skip("native jpegpipe unavailable")
    import ctypes
    from PIL import Image
    ds = synthetic_dataset(n=1, img_size=48, seed=1)
    bio = io.BytesIO()
    Image.fromarray(ds.images[0]).save(bio, format="JPEG", quality=90)
    raw = bio.getvalue()
    ref = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
    lib = IN._lib()
    out = np.empty(48 * 48 * 3, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.vitrs_jpeg_decode(raw, ctypes.c_int64(len(raw)),
                               out.ctypes.data_as(
                                   ctypes.POINTER(ctypes.c_uint8)),
                               ctypes.c_int64(out.size),
                               ctypes.byref(w), ctypes.byref(h))
    assert rc == 0 and (w.value, h.value) == (48, 48)
    got = out.reshape(48, 48, 3)
    # identical libjpeg versions => at most tiny rounding differences
    assert np.mean(np.abs(got.astype(int) - ref.astype(int))) < 1.0


def test_streaming_loader_deterministic_and_resumable(shard_dir):
    ds = IN.ShardedImageNet(shard_dir)
    assert ds.total == 120
    a = IN.StreamingLoader(ds, batch_size=16, img_size=48, train=True, seed=5)
    batches = [a.next_batch() for _ in range(5)]
    # same seed from scratch => identical stream
    b = IN.StreamingLoader(ds, batch_size=16, img_size=48, train=True, seed=5)
    for x, y in batches:
        x2, y2 = b.next_batch()
        np.testing.assert_array_equal(x, x2)
        np.testing.assert_array_equal(y, y2)
    # resume from cursor mid-epoch => continues identically
    c = IN.StreamingLoader(ds, batch_size=16, img_size=48, train=True, seed=5,
                           cursor=3 * 16)
    for x, y in batches[3:]:
        x3, y3 = c.next_batch()
        np.testing.assert_array_equal(x, x3)
        np.testing.assert_array_equal(y, y3)


def test_epoch_reshuffles_but_covers_everything(shard_dir):
    ds = IN.ShardedImageNet(shard_dir)
    ld = IN.StreamingLoader(ds, batch_size=24, img_size=32, train=True, seed=2)
    so0, io0 = ld._epoch_order(0)
    so1, io1 = ld._epoch_order(1)
    assert not (np.array_equal(so0, so1) and np.array_equal(io0, io1))
    # every epoch is a permutation of all samples
    ids0 = ds.bases[so0] + io0
    assert sorted(ids0.tolist()) == list(range(ds.total))


def test_eval_transform_close_to_pil(shard_dir):
    """resize-shorter-side + center-crop vs the PIL reference — different
    bilinear implementations, so tolerance-based."""
    ds = IN.ShardedImageNet(shard_dir)
    sh = ds.shards[0]
    raw = sh.blob(0)
    from PIL import Image
    img = Image.open(io.BytesIO(raw)).convert("RGB")
    W, H = img.size
    S, R = 48, 54
    side = min(W, H) * S / R
    box = ((W - side) / 2, (H - side) / 2, (W + side) / 2, (H + side) / 2)
    ref = np.asarray(img.resize((S, S), Image.BILINEAR, box=box), np.float32)
    buf = np.frombuffer(raw, np.uint8)
    off = np.array([0, len(raw)], np.int64)
    got = IN.decode_augment_batch(buf, off, np.array([0], np.int64), S, False,
                                  0, 0, eval_resize=R,
                                  mean=np.zeros(3, np.float32),
                                  std=np.ones(3, np.float32))[0] * 255.0
    assert np.mean(np.abs(got - ref)) < 6.0


def test_train_crops_vary_across_samples_and_epochs(shard_dir):
    ds = IN.ShardedImageNet(shard_dir)
    ld = IN.StreamingLoader(ds, batch_size=8, img_size=32, train=True, seed=0)
    x0, _ = ld.next_batch()
    assert not np.array_equal(x0[0], x0[1])          # per-sample randomness
    # same sample in a later epoch gets a different crop
    ld.cursor = ld.steps_per_epoch * 8               # jump to epoch 1
    x1, _ = ld.next_batch()
    assert not np.array_equal(x0, x1)


def test_randaugment_and_corrupt_blob(shard_dir):
    ds = IN.ShardedImageNet(shard_dir)
    ld = IN.StreamingLoader(ds, batch_size=8, img_size=32, train=True, seed=0,
                            ra_ops=2, ra_mag=0.7)
    x, _ = ld.next_batch()
    assert np.isfinite(x).all()
    # corrupt blob -> zero-filled slot, no crash
    buf = np.frombuffer(b"\xff\xd8garbage-not-a-jpeg", np.uint8)
    off = np.array([0, len(buf)], np.int64)
    out = IN.decode_augment_batch(buf, off, np.array([0], np.int64), 32, True,
                                  0, 0)
    assert (out == 0).all()


def test_imagenet_train_loop_end_to_end(shard_dir, tmp_path):
    """dataset='imagenet' through the real train loop: streaming shards ->
    native decode -> DP step; loss finite, eval runs on the val split."""
    from vitrs_tpu.train.loop import TrainConfig, train
    tc = TrainConfig(preset="vit-tiny-4-cifar10", dataset="imagenet",
                     data_dir=shard_dir, steps=4, batch_size=16, lr=1e-3,
                     warmup=1, dtype="float32", log_every=2, ckpt_every=4,
                     seed=0, workdir=str(tmp_path / "run"),
                     ra_ops=1, ra_mag=0.3, mixup_alpha=0.2,
                     model_overrides=dict(num_layers=2, channels=32,
                                          num_heads=2, use_flash=False,
                                          img_size=32, patch_size=4))
    summary = train(tc)
    assert np.isfinite(summary["final_loss"])
    # val split has 24 samples, eval batch 16 -> one full batch evaluated
    assert summary["eval"]["n"] == 16


def test_pack_imagenet_tree(tmp_path):
    """Raw <split>/<wnid>/*.JPEG tree packs into shards loadable end-to-end."""
    from PIL import Image
    ds = synthetic_dataset(n=12, img_size=32, num_classes=3, seed=4)
    src = tmp_path / "raw"
    for i in range(12):
        wnid = f"n{int(ds.labels[i]):08d}"
        d = src / "train" / wnid
        d.mkdir(parents=True, exist_ok=True)
        Image.fromarray(ds.images[i]).save(str(d / f"img_{i}.JPEG"),
                                           quality=92)
    out = str(tmp_path / "packed")
    n_shards = IN.pack_imagenet(str(src), out, per_shard=5, verbose=False)
    assert n_shards == 3                      # 5 + 5 + 2
    packed = IN.ShardedImageNet(out)
    assert packed.total == 12 and packed.num_classes == 3
    ld = IN.StreamingLoader(packed, batch_size=4, img_size=32, train=True)
    x, y = ld.next_batch()
    assert x.shape == (4, 32, 32, 3) and np.isfinite(x).all()


def test_mixup_step_matches_manual():
    """Device-side mixup: loss equals lam*CE(y) + (1-lam)*CE(y[perm]) with
    the same keyed draws."""
    import jax
    import jax.numpy as jnp
    from vitrs_tpu import params as PRM
    from vitrs_tpu.config import get_config
    from vitrs_tpu.models import model as M
    from vitrs_tpu.ops import basic
    from vitrs_tpu.parallel import data_parallel as dp
    cfg = get_config("vit-tiny-4-cifar10", use_flash=False).replace(
        num_layers=2, channels=32, num_heads=2)
    mesh = dp.make_mesh(1)
    params = dp.replicate(PRM.init_params(cfg, jax.random.PRNGKey(0)), mesh)
    m, v = dp.init_sharded_opt_state(cfg, mesh)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3), dtype=np.float32))
    y = jnp.asarray(rng.integers(0, 10, (8,)))
    step_fn = dp.make_dp_train_step(cfg, mesh, mixup_alpha=0.4)
    step = jnp.asarray(3, jnp.int32)
    _, _, _, loss = step_fn(params, m, v, dp.shard_batch(x, mesh),
                            dp.shard_batch(y, mesh), step,
                            jnp.asarray(0.0, jnp.float32),
                            jnp.asarray(0.0, jnp.float32))
    key = jax.random.fold_in(jax.random.PRNGKey(0x31A5), step)
    key = jax.random.fold_in(key, 0)
    k_lam, k_perm = jax.random.split(key)
    lam = jax.random.beta(k_lam, 0.4, 0.4).astype(x.dtype)
    perm = jax.random.permutation(k_perm, 8)
    mixed = lam * x + (1 - lam) * x[perm]
    p_host = PRM.init_params(cfg, jax.random.PRNGKey(0))
    logits = M.vit_forward(p_host, mixed, cfg, train=True)
    ce = lambda t: float(jnp.mean(basic.cross_entropy_from_logits(logits, t)))
    want = float(lam) * ce(y) + (1 - float(lam)) * ce(y[perm])
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
