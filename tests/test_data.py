"""Data pipeline tests: sharded sampler semantics, on-device augmentations,
CutMix/MixUp, loaders."""

import jax
import jax.numpy as jnp
import numpy as np

from calm_vit_dte_tpu.data.augment import augment_batch, eval_preprocess
from calm_vit_dte_tpu.data.loader import BatchLoader, SyntheticDataset
from calm_vit_dte_tpu.data.mixup import cutmix, cutmix_or_mixup, mixup
from calm_vit_dte_tpu.data.sampler import ShardedSampler


class TestShardedSampler:
    def test_disjoint_and_covering(self):
        n, world = 103, 4
        shards = [ShardedSampler(n, world, r).indices() for r in range(world)]
        sizes = {len(s) for s in shards}
        assert sizes == {26}  # ceil(103/4), padded by wrap-around
        all_idx = np.concatenate(shards)
        # padding duplicates exactly total-n indices; all of [0,n) covered
        assert set(all_idx.tolist()) == set(range(n))

    def test_epoch_reshuffles_deterministically(self):
        s = ShardedSampler(100, 2, 0)
        a = s.indices()
        s.set_epoch(1)
        b = s.indices()
        s.set_epoch(0)
        c = s.indices()
        assert not np.array_equal(a, b)
        assert np.array_equal(a, c)

    def test_shards_agree_on_permutation(self):
        n, world = 64, 4
        full = []
        for r in range(world):
            full.append(ShardedSampler(n, world, r).indices())
        interleaved = np.empty(n, dtype=np.int64)
        for r in range(world):
            interleaved[r::world] = full[r]
        assert set(interleaved.tolist()) == set(range(n))


class TestAugment:
    def test_shapes_range_and_determinism(self):
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.integers(0, 256, (4, 64, 64, 3),
                                        dtype=np.uint8))
        f = jax.jit(lambda k, x: augment_batch(k, x, crop=48))
        out = f(jax.random.PRNGKey(0), imgs)
        assert out.shape == (4, 48, 48, 3)
        assert out.dtype == jnp.float32
        assert np.isfinite(np.asarray(out)).all()
        out2 = f(jax.random.PRNGKey(0), imgs)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
        out3 = f(jax.random.PRNGKey(1), imgs)
        assert not np.array_equal(np.asarray(out), np.asarray(out3))

    def test_eval_preprocess_center_crop(self):
        imgs = jnp.zeros((2, 64, 64, 3), jnp.uint8)
        out = eval_preprocess(imgs, crop=48)
        assert out.shape == (2, 48, 48, 3)
        # all-zero image -> exactly -mean/std
        np.testing.assert_allclose(
            np.asarray(out[0, 0, 0]),
            -np.array([0.485, 0.456, 0.406]) / np.array([0.229, 0.224,
                                                         0.225]),
            rtol=1e-5)


class TestMixup:
    def test_mixup_soft_labels(self):
        imgs = jnp.ones((4, 8, 8, 3))
        labels = jnp.asarray([0, 1, 2, 3])
        mixed, y = mixup(jax.random.PRNGKey(0),
                         imgs, jax.nn.one_hot(labels, 10), alpha=0.8)
        assert y.shape == (4, 10)
        np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, rtol=1e-5)

    def test_cutmix_lambda_matches_box(self):
        b, h, w = 4, 16, 16
        imgs = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.float32)[:, None, None, None],
            (b, h, w, 3))
        labels = jax.nn.one_hot(jnp.arange(b), b)
        mixed, y = cutmix(jax.random.PRNGKey(3), imgs, labels, alpha=1.0)
        # fraction of own pixels == own-label weight
        own = (np.asarray(mixed[1]) == 1.0).mean()
        np.testing.assert_allclose(own, float(y[1, 1]), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, rtol=1e-5)

    def test_choice_jits(self):
        imgs = jnp.ones((4, 8, 8, 3))
        labels = jnp.asarray([0, 1, 2, 3])
        f = jax.jit(lambda k: cutmix_or_mixup(k, imgs, labels, 10))
        for seed in range(3):
            mixed, y = f(jax.random.PRNGKey(seed))
            assert mixed.shape == imgs.shape
            np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0,
                                       rtol=1e-5)


class TestLoader:
    def test_synthetic_loader_epoch(self):
        ds = SyntheticDataset(n=40, num_classes=7, size=16)
        sampler = ShardedSampler(len(ds), 2, 0)
        loader = BatchLoader(ds, sampler, batch_size=4, num_workers=2)
        batches = list(loader)
        assert len(batches) == loader.steps_per_epoch() == 5
        for b in batches:
            assert b["image"].shape == (4, 16, 16, 3)
            assert b["image"].dtype == np.uint8
            assert b["label"].shape == (4,)
        # deterministic across iterations of the same epoch
        again = list(loader)
        np.testing.assert_array_equal(batches[0]["image"],
                                      again[0]["image"])


class FailingDataset:
    """Dataset whose item 7 always raises (simulates a corrupt file that
    both the native decoder and the PIL fallback reject)."""

    size = 8

    def __len__(self):
        return 32

    def load(self, idx):
        if idx == 7:
            raise OSError("truncated image")
        rng = np.random.default_rng(idx)
        return (rng.integers(0, 256, (8, 8, 3), dtype=np.uint8),
                int(idx % 4))


class TestLoaderFailure:
    def test_corrupt_sample_raises_instead_of_hanging(self):
        ds = FailingDataset()
        sampler = ShardedSampler(len(ds), 1, 0, shuffle=False)
        loader = BatchLoader(ds, sampler, batch_size=4, num_workers=2)
        import pytest

        with pytest.raises(RuntimeError, match="data worker failed"):
            for _ in loader:
                pass


class TestEvalCoverage:
    def test_valid_mask_excludes_wrap_padding(self):
        n, world = 103, 4  # ceil -> 26/shard, 1 duplicate in shard 3
        masks = [ShardedSampler(n, world, r, shuffle=False).valid_mask()
                 for r in range(world)]
        assert sum(int(m.sum()) for m in masks) == n
        idxs = [ShardedSampler(n, world, r, shuffle=False).indices()
                for r in range(world)]
        real = np.concatenate([i[m] for i, m in zip(idxs, masks)])
        assert sorted(real.tolist()) == list(range(n))

    def test_pad_last_covers_each_sample_once(self):
        ds = SyntheticDataset(n=21, num_classes=4, size=8)
        sampler = ShardedSampler(len(ds), 2, 0, shuffle=False)
        loader = BatchLoader(ds, sampler, batch_size=4, num_workers=1,
                             pad_last=True)
        seen = []
        for batch in loader:
            assert batch["image"].shape[0] == 4  # static shapes
            assert "valid" in batch
            seen.extend(
                np.asarray(batch["label"])[batch["valid"]].tolist())
        # shard 0 of 21 samples over 2 shards: 11 entries, all real
        # (wrap padding lands in shard 1); loader pad fills batch 3.
        assert len(seen) == 11
