"""Data pipeline tests: native/NumPy augment equivalence, determinism,
resumable cursor, host sharding, prefetcher (SURVEY.md §5.3: deterministic
resume includes the dataloader cursor)."""

import numpy as np

from vitrs_tpu.data import augment as A
from vitrs_tpu.data import datasets as D
from vitrs_tpu.data.prefetch import DevicePrefetcher


def _imgs(n=64, hw=16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, hw, hw, 3), dtype=np.uint8)


def test_native_matches_numpy_fallback():
    imgs = _imgs()
    idx = np.arange(32, dtype=np.int64)
    mean = np.array([0.5, 0.5, 0.5], np.float32)
    std = np.array([0.25, 0.25, 0.25], np.float32)
    ref = A._augment_numpy(imgs, idx, 2, 1, 7, 3, mean, std)
    got = A.augment_batch(imgs, idx, crop_pad=2, flip=True, seed=7, epoch=3,
                          mean=mean, std=std)
    # identical semantics; tolerance only for FMA contraction in -O3 code
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_augment_deterministic_across_threads():
    imgs = _imgs()
    idx = np.arange(48, dtype=np.int64)
    a = A.augment_batch(imgs, idx, crop_pad=4, flip=True, seed=1, epoch=2,
                        nthreads=1)
    b = A.augment_batch(imgs, idx, crop_pad=4, flip=True, seed=1, epoch=2,
                        nthreads=8)
    np.testing.assert_array_equal(a, b)


def test_eval_transform_is_identity_normalize():
    imgs = _imgs()
    idx = np.array([3, 5], np.int64)
    out = A.augment_batch(imgs, idx, crop_pad=0, flip=False)
    np.testing.assert_allclose(out, imgs[idx].astype(np.float32) / 255.0,
                               atol=1e-6)


def test_loader_cursor_resume():
    """A loader resumed from a cursor must produce the identical stream."""
    ds = D.synthetic_dataset(n=256, img_size=16, num_classes=4)
    l1 = D.DataLoader(ds, batch_size=32, seed=5)
    batches = [l1.next_batch() for _ in range(10)]
    l2 = D.DataLoader(ds, batch_size=32, seed=5, cursor=5 * 32)
    for i in range(5, 10):
        x2, y2 = l2.next_batch()
        np.testing.assert_array_equal(batches[i][0], x2)
        np.testing.assert_array_equal(batches[i][1], y2)


def test_loader_epoch_reshuffles():
    ds = D.synthetic_dataset(n=64, img_size=16, num_classes=4)
    loader = D.DataLoader(ds, batch_size=64, seed=0)
    _, y1 = loader.next_batch()
    _, y2 = loader.next_batch()     # next epoch
    assert not np.array_equal(y1, y2)
    assert sorted(y1.tolist()) == sorted(y2.tolist())   # same multiset


def test_host_sharding_partitions_batch():
    ds = D.synthetic_dataset(n=128, img_size=16, num_classes=4)
    full = D.DataLoader(ds, batch_size=32, seed=2).next_batch()[1]
    parts = []
    for host in range(4):
        parts.append(D.DataLoader(ds, batch_size=32, seed=2, host_id=host,
                                  num_hosts=4).next_batch()[1])
    assert all(len(p) == 8 for p in parts)
    interleaved = np.empty(32, np.int64)
    for host, p in enumerate(parts):
        interleaved[host::4] = p
    np.testing.assert_array_equal(interleaved, full)


def test_prefetcher_delivers_and_closes():
    ds = D.synthetic_dataset(n=64, img_size=16, num_classes=4)
    loader = D.DataLoader(ds, batch_size=16, seed=0)
    pf = DevicePrefetcher(loader)
    try:
        for _ in range(3):
            x, y = next(pf)
            assert x.shape == (16, 16, 16, 3)
    finally:
        pf.close()


def test_synthetic_dataset_has_class_signal():
    """Classes must be separable enough that a linear probe beats chance —
    guards against the fallback dataset degenerating to noise."""
    ds = D.synthetic_dataset(n=512, img_size=16, num_classes=4, seed=3)
    x = ds.images.reshape(len(ds), -1).astype(np.float32) / 255.0
    y = ds.labels
    centroids = np.stack([x[y == c].mean(0) for c in range(4)])
    pred = np.argmin(
        ((x[:, None, :] - centroids[None]) ** 2).sum(-1), axis=1)
    assert (pred == y).mean() > 0.9


def test_uint8_loader_matches_host_normalize():
    """device_normalize=True ships uint8 with the SAME per-sample augment
    draws: normalizing its batch on the host must bit-match the float
    loader's batch (the two paths differ only in where (x/255-mean)/std
    runs)."""
    ds = D.synthetic_dataset(n=256, img_size=16, num_classes=4, seed=5)
    a = D.DataLoader(ds, batch_size=32, seed=7, train=True)
    b = D.DataLoader(ds, batch_size=32, seed=7, train=True,
                     device_normalize=True)
    for _ in range(3):
        xa, ya = a.next_batch()
        xb, yb = b.next_batch()
        assert xb.dtype == np.uint8 and xa.dtype == np.float32
        np.testing.assert_array_equal(ya, yb)
        xb_norm = (xb.astype(np.float32) / 255.0 - ds.mean) / ds.std
        np.testing.assert_allclose(xa, xb_norm, rtol=1e-6, atol=1e-6)


def test_synthetic_shapes_is_hard_but_learnable():
    """The shapes task (accuracy-datapoint dataset) must NOT be linearly
    separable in pixel space (shapes move around), yet have consistent
    labels: a nearest-centroid probe stays well under 50% while fresh
    samples from another seed share the generator's class semantics."""
    ds = D.synthetic_shapes(n=1200, img_size=32, seed=0)
    x = ds.images.reshape(len(ds), -1).astype(np.float32)
    y = ds.labels
    cent = np.stack([x[y == c].mean(0) for c in range(10)])
    pred = np.argmin(((x[:, None, :] - cent[None]) ** 2).sum(-1), axis=1)
    acc = (pred == y).mean()
    assert 0.05 < acc < 0.5, acc          # above floor, far from separable
    ds2 = D.synthetic_shapes(n=64, img_size=32, seed=9)
    assert ds2.images.shape == (64, 32, 32, 3)
    assert set(np.unique(ds2.labels)) <= set(range(10))
