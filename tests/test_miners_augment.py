"""Tests for batch-hard miners, pose-est losses, and MinkLoc augs."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from patchaugnet_tpu import losses
from patchaugnet_tpu.data import augment


def _masks(rng, n):
    pos = rng.rand(n, n) < 0.3
    np.fill_diagonal(pos, False)
    neg = (rng.rand(n, n) < 0.5) & ~pos
    np.fill_diagonal(neg, False)
    return jnp.asarray(pos), jnp.asarray(neg)


class TestBatchHard:
    def test_triplet_mining_semantics(self, rng):
        emb = jnp.asarray(rng.randn(12, 8).astype(np.float32))
        pos, neg = _masks(rng, 12)
        loss, stats = losses.batch_hard_triplet_loss(emb, pos, neg, margin=0.2)
        assert np.isfinite(float(loss)) and float(loss) >= 0
        assert int(stats["num_triplets"]) > 0
        # well-separated clusters -> zero loss
        emb2 = jnp.concatenate([jnp.ones((6, 8)) * 100, -jnp.ones((6, 8)) * 100])
        pos2 = np.zeros((12, 12), bool)
        pos2[:6, :6] = True
        pos2[6:, 6:] = True
        np.fill_diagonal(pos2, False)
        neg2 = ~pos2
        np.fill_diagonal(neg2, False)
        loss2, _ = losses.batch_hard_triplet_loss(
            emb2, jnp.asarray(pos2), jnp.asarray(neg2), margin=0.2
        )
        assert float(loss2) == 0.0

    def test_contrastive(self, rng):
        emb = jnp.asarray(rng.randn(10, 8).astype(np.float32))
        pos, neg = _masks(rng, 10)
        loss, stats = losses.batch_hard_contrastive_loss(emb, pos, neg)
        assert np.isfinite(float(loss))
        assert float(stats["pos_loss"]) >= 0 and float(stats["neg_loss"]) >= 0

    def test_contrastive_quadruplet(self, rng):
        q = jnp.asarray(rng.randn(3, 1, 8).astype(np.float32))
        p = jnp.asarray(rng.randn(3, 2, 8).astype(np.float32))
        n = jnp.asarray(rng.randn(3, 4, 8).astype(np.float32))
        o = jnp.asarray(rng.randn(3, 1, 8).astype(np.float32))
        loss = losses.contrastive_quadruplet_loss(q, p, n, o, 0.5, 0.2)
        assert np.isfinite(float(loss))
        g = jax.grad(
            lambda q: losses.contrastive_quadruplet_loss(q, p, n, o, 0.5, 0.2)
        )(q)
        assert bool(jnp.isfinite(g).all())


class TestPoseLosses:
    def test_ot_loss(self, rng):
        scores = jnp.asarray(rng.rand(2, 9, 9).astype(np.float32))
        pair_idx = jnp.asarray(rng.randint(0, 8, (2, 5, 2)))
        pair_valid = jnp.asarray(np.array([[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]], bool))
        up0 = jnp.asarray(rng.randint(0, 8, (2, 4)))
        up0v = jnp.asarray(np.ones((2, 4), bool))
        up1 = jnp.asarray(rng.randint(0, 8, (2, 4)))
        up1v = jnp.asarray(np.zeros((2, 4), bool))
        loss = losses.ot_loss(scores, pair_idx, pair_valid, up0, up0v, up1, up1v)
        assert np.isfinite(float(loss))

    def test_pps_loss(self, rng):
        src = jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
        tgt = jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
        neg_idxs = jnp.asarray(rng.randint(0, 16, (2, 6, 2 + 3)))
        valid = jnp.asarray(rng.rand(2, 6) < 0.8)
        loss = losses.pps_loss(src, tgt, neg_idxs, valid, margin=0.5)
        assert np.isfinite(float(loss)) and float(loss) >= 0


class TestAugment:
    def test_jitter_bounded(self, rng):
        e = rng.rand(100, 3)
        out = augment.jitter_points(e, sigma=0.001, clip=0.002, rng=rng)
        assert np.abs(out - e).max() <= 0.002 + 1e-9

    def test_remove_random_points_zeroes(self, rng):
        e = rng.rand(100, 3) + 1.0
        out = augment.remove_random_points(e, 0.2, rng=rng)
        assert (np.all(out == 0, axis=1)).sum() == 20

    def test_remove_random_block(self, rng):
        e = rng.rand(500, 3)
        out = augment.remove_random_block(e, p=1.0, rng=rng)
        assert out.shape == e.shape

    def test_random_rotation_preserves_norms(self, rng):
        e = rng.rand(50, 3)
        out = augment.random_rotation(e, rng=rng)
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=1), np.linalg.norm(e, axis=1), atol=1e-5
        )

    def test_random_flip(self, rng):
        e = rng.rand(20, 3)
        out = augment.random_flip(e, [1.0, 0.0, 0.0], rng=rng)
        np.testing.assert_allclose(out[:, 0], -e[:, 0])

    def test_composed_transforms(self, rng):
        e = rng.rand(200, 3)
        out = augment.train_transform(e, rng=rng)
        assert out.shape == e.shape
        out = augment.train_set_transform(e, rng=rng)
        assert out.shape == e.shape
