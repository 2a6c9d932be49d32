"""Loss tests: numpy oracles for metric losses, masked-vs-dense patch
losses, and the padded a2b contrast against its per-pair oracle."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from patchaugnet_tpu import losses
from patchaugnet_tpu.losses import PatchCorrespondences


def np_quadruplet(q, pos, neg, other, m1, m2, lazy=True, use_min=False):
    """Independent numpy oracle for the quadruplet loss semantics
    (margins hinge on max-positive distance; second term anchored at
    other_neg; lazy=max over negatives, else mean)."""
    B = q.shape[0]
    d_pos = ((pos - q) ** 2).sum(-1)                        # (B, P)
    positive = d_pos.min(1) if use_min else d_pos.max(1)    # (B,)
    d_neg = ((neg - q) ** 2).sum(-1)                        # (B, N)
    l1 = np.maximum(m1 + positive[:, None] - d_neg, 0.0)
    l1 = l1.max(1) if lazy else l1.mean(1)
    d_on = ((neg - other) ** 2).sum(-1)
    l2 = np.maximum(m2 + positive[:, None] - d_on, 0.0)
    l2 = l2.max(1) if lazy else l2.mean(1)
    return l1.mean() + l2.mean()


class TestQuadruplet:
    @pytest.mark.parametrize("lazy", [True, False])
    @pytest.mark.parametrize("use_min", [True, False])
    def test_vs_numpy(self, rng, lazy, use_min):
        q = rng.randn(4, 1, 16).astype(np.float32)
        pos = rng.randn(4, 2, 16).astype(np.float32)
        neg = rng.randn(4, 5, 16).astype(np.float32)
        other = rng.randn(4, 1, 16).astype(np.float32)
        got = float(
            losses.quadruplet_loss(q, pos, neg, other, 0.5, 0.2, use_min=use_min, lazy=lazy)
        )
        expect = np_quadruplet(q, pos, neg, other, 0.5, 0.2, lazy=lazy, use_min=use_min)
        np.testing.assert_allclose(got, expect, rtol=1e-5)

    def test_zero_when_margin_satisfied(self, rng):
        # negatives pushed very far -> hinge inactive
        q = np.zeros((2, 1, 4), np.float32)
        pos = np.zeros((2, 2, 4), np.float32)
        neg = np.full((2, 3, 4), 100.0, np.float32)
        other = np.zeros((2, 1, 4), np.float32)
        assert float(losses.quadruplet_loss(q, pos, neg, other, 0.5, 0.2, lazy=True)) == 0.0

    def test_triplet_sum_semantics(self, rng):
        q = rng.randn(3, 1, 8).astype(np.float32)
        pos = rng.randn(3, 2, 8).astype(np.float32)
        neg = rng.randn(3, 4, 8).astype(np.float32)
        got = float(losses.triplet_loss(q, pos, neg, 0.5, lazy=False))
        d_pos = ((pos - q) ** 2).sum(-1).max(1)
        d_neg = ((neg - q) ** 2).sum(-1)
        expect = np.maximum(0.5 + d_pos[:, None] - d_neg, 0).sum(1).mean()
        np.testing.assert_allclose(got, expect, rtol=1e-5)

    def test_hphn(self, rng):
        q = rng.randn(3, 1, 8).astype(np.float32)
        pos = rng.randn(3, 2, 8).astype(np.float32)
        neg = rng.randn(3, 4, 8).astype(np.float32)
        other = rng.randn(3, 1, 8).astype(np.float32)
        got = float(losses.hphn_quadruplet_loss(q, pos, neg, other, 0.5, 0.2))
        max_pos = ((pos - q) ** 2).sum(-1).max(1)
        min_neg = ((neg - q) ** 2).sum(-1).min(1)
        min_on = ((neg - other) ** 2).sum(-1).min(1)
        expect = np.maximum(0.5 + max_pos - np.minimum(min_neg, min_on), 0).mean()
        np.testing.assert_allclose(got, expect, rtol=1e-5)


class TestPatchRecon:
    def test_patch_chamfer_mask_equals_subset(self, rng):
        origin = rng.rand(4, 8, 10, 3).astype(np.float32)
        recon = rng.rand(4, 8, 10, 3).astype(np.float32)
        mask = np.array([True, False, True, False])
        got = float(losses.patch_chamfer_loss(origin, recon, jnp.asarray(mask)))
        expect = float(losses.patch_chamfer_loss(origin[mask], recon[mask], None))
        np.testing.assert_allclose(got, expect, rtol=1e-5)

    def test_patch_emd_identity(self, rng):
        p = rng.rand(2, 4, 16, 3).astype(np.float32)
        got = float(losses.patch_emd_loss(p, p.copy(), iters=200))
        assert got < 1e-3

    def test_chamfer_loss_symmetric_zero(self, rng):
        pc = rng.rand(3, 64, 3).astype(np.float32)
        assert float(losses.chamfer_loss(pc, pc.copy())) < 1e-4


class TestPatchContrast:
    def test_matches_per_pair_oracle(self, rng):
        B, M, D = 4, 16, 8
        pf = rng.randn(B, M, D).astype(np.float32)
        # two pairs: (0,1) with 3 rows, (2,3) with 2 rows; 3 padding rows
        rows = [
            # (q_cloud, n_cloud, q, pos, neg, pair, valid)
            (0, 1, 2, 5, 7, 0, True),
            (0, 1, 3, 6, 1, 0, True),
            (0, 1, 2, 0, 9, 0, True),
            (2, 3, 1, 2, 3, 1, True),
            (2, 3, 4, 5, 6, 1, True),
            (0, 0, 0, 0, 0, 0, False),
            (0, 0, 0, 0, 0, 1, False),
            (0, 0, 0, 0, 0, 0, False),
        ]
        arr = np.array(rows, dtype=object)
        corr = PatchCorrespondences(
            row_q_cloud=jnp.asarray([r[0] for r in rows], jnp.int32),
            row_n_cloud=jnp.asarray([r[1] for r in rows], jnp.int32),
            row_q_idx=jnp.asarray([r[2] for r in rows], jnp.int32),
            row_pos_idx=jnp.asarray([r[3] for r in rows], jnp.int32),
            row_neg_idx=jnp.asarray([r[4] for r in rows], jnp.int32),
            row_pair_id=jnp.asarray([r[5] for r in rows], jnp.int32),
            row_valid=jnp.asarray([r[6] for r in rows]),
            num_pairs=3,
        )
        margin = 0.5
        got = float(losses.patch_contrastive_loss(jnp.asarray(pf), corr, margin))

        # oracle: per-pair contrastive over stacked valid rows, averaged
        pair_losses = []
        for pid in (0, 1):
            sel = [r for r in rows if r[5] == pid and r[6]]
            q = jnp.asarray(np.stack([pf[r[0], r[2]] for r in sel]))
            p = jnp.asarray(np.stack([pf[r[1], r[3]] for r in sel]))
            n = jnp.asarray(np.stack([pf[r[1], r[4]] for r in sel]))
            pair_losses.append(float(losses.contrastive_loss(q, p, n, margin)))
        expect = np.mean(pair_losses)
        np.testing.assert_allclose(got, expect, rtol=1e-4)

    def test_empty_correspondences_zero(self, rng):
        pf = jnp.asarray(rng.randn(2, 8, 4).astype(np.float32))
        corr = PatchCorrespondences.empty(16, 4)
        assert float(losses.patch_contrastive_loss(pf, corr, 0.5)) == 0.0

    def test_jittable_and_grad(self, rng):
        pf = jnp.asarray(rng.randn(2, 8, 4).astype(np.float32))
        corr = PatchCorrespondences(
            row_q_cloud=jnp.zeros(4, jnp.int32),
            row_n_cloud=jnp.ones(4, jnp.int32),
            row_q_idx=jnp.arange(4, dtype=jnp.int32),
            row_pos_idx=jnp.arange(4, dtype=jnp.int32),
            row_neg_idx=jnp.arange(4, dtype=jnp.int32)[::-1],
            row_pair_id=jnp.zeros(4, jnp.int32),
            row_valid=jnp.ones(4, bool),
            num_pairs=1,
        )
        f = jax.jit(lambda p: losses.patch_contrastive_loss(p, corr, 0.5))
        g = jax.grad(lambda p: f(p))(pf)
        assert bool(jnp.isfinite(g).all())


class TestExtraLosses:
    def test_smooth_ap_perfect_vs_bad_ranking(self, rng):
        # well-separated clusters -> high AP -> low loss
        emb = np.concatenate(
            [rng.randn(4, 16) * 0.01 + 10, rng.randn(4, 16) * 0.01 - 10]
        ).astype(np.float32)
        n = 8
        pos = np.zeros((n, n), bool)
        pos[:4, :4] = True
        pos[4:, 4:] = True
        np.fill_diagonal(pos, False)
        neg = ~pos
        np.fill_diagonal(neg, False)
        loss_good, stats = losses.truncated_smooth_ap(
            jnp.asarray(emb), jnp.asarray(pos), jnp.asarray(neg)
        )
        assert float(loss_good) < 0.1
        assert float(stats["ap"]) > 0.9

    def test_multi_similarity_basic(self, rng):
        a = rng.randn(2, 3, 8).astype(np.float32)
        p = (a + rng.randn(2, 3, 8).astype(np.float32) * 0.01)
        n_hard = (a + rng.randn(2, 3, 8).astype(np.float32) * 0.05)
        loss = float(losses.multi_similarity_loss(a, p, n_hard))
        assert np.isfinite(loss) and loss > 0
        # easy negatives fail the mining filter -> every batch item skipped
        # -> zero loss (reference 'continue' + empty-list semantics)
        n_easy = -a
        assert float(losses.multi_similarity_loss(a, p, n_easy)) == 0.0

    def test_focal_losses(self, rng):
        logits = rng.randn(6, 5).astype(np.float32)
        target = rng.randint(0, 5, 6)
        assert np.isfinite(float(losses.focal_loss(logits, target)))
        p = jax.nn.sigmoid(jnp.asarray(rng.randn(6, 5).astype(np.float32)))
        t = jnp.asarray(rng.randint(0, 2, (6, 5)).astype(np.float32))
        assert np.isfinite(float(losses.binary_focal_loss(p, t)))
