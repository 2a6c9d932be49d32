"""Oracle tests for patchaugnet_tpu.ops against numpy/scipy references.

Ports the reference's only real test pattern — cross-checking the CUDA
kNN against sklearn KDTree (libs/KNN_CUDA/tests/test_knn_cuda.py:11-87) —
to every op, plus grad checks replacing chamfer's torch gradcheck
(libs/chamfer_dist/test.py:23-38) and EMD's numpy self-verification
(libs/emd_module/emd_module.py:81-95).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from patchaugnet_tpu import ops


def np_pairwise_sqdist(x, y):
    return ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)


def np_fps(xyz, m):
    n = xyz.shape[0]
    idx = np.zeros(m, dtype=np.int64)
    min_d = np.full(n, 1e10)
    for i in range(1, m):
        d = ((xyz - xyz[idx[i - 1]]) ** 2).sum(-1)
        min_d = np.minimum(min_d, d)
        idx[i] = int(np.argmax(min_d))
    return idx


class TestPairwise:
    def test_matches_numpy(self, rng):
        x = rng.randn(7, 3).astype(np.float32)
        y = rng.randn(11, 3).astype(np.float32)
        got = np.asarray(ops.pairwise_sqdist(x, y))
        np.testing.assert_allclose(got, np_pairwise_sqdist(x, y), atol=1e-4)

    def test_batched(self, rng):
        x = rng.randn(2, 5, 3).astype(np.float32)
        y = rng.randn(2, 6, 3).astype(np.float32)
        got = np.asarray(ops.pairwise_sqdist(x, y))
        for b in range(2):
            np.testing.assert_allclose(
                got[b], np_pairwise_sqdist(x[b], y[b]), atol=1e-4
            )


class TestKNN:
    @pytest.mark.parametrize(
        "n,m,k",
        [
            (100, 30, 5),
            (257, 63, 17),
            (1001, 101, 20),
            # the reference KNN_CUDA suite's irregular/asymmetric cases
            # (libs/KNN_CUDA/tests/test_knn_cuda.py:11-87): non-multiples
            # and ref >> query
            (10001, 11, 9),
            (3000, 50, 33),
        ],
    )
    def test_vs_bruteforce(self, rng, n, m, k):
        xyz = rng.randn(2, n, 3).astype(np.float32)
        new_xyz = rng.randn(2, m, 3).astype(np.float32)
        idx, d2 = ops.knn(xyz, new_xyz, k)
        idx, d2 = np.asarray(idx), np.asarray(d2)
        for b in range(2):
            dm = np_pairwise_sqdist(new_xyz[b], xyz[b])
            ref_idx = np.argsort(dm, axis=1, kind="stable")[:, :k]
            np.testing.assert_array_equal(idx[b], ref_idx)
            np.testing.assert_allclose(
                d2[b], np.take_along_axis(dm, ref_idx, 1), atol=1e-3
            )

    def test_approx_recall_path(self, rng):
        """KNN_APPROX_RECALL routes through lax.approx_max_k (TPU
        PartialReduce; exact on the CPU backend): same shapes, >=90%
        neighbour recall vs the exact op."""
        xyz = rng.randn(2, 300, 3).astype(np.float32)
        new = rng.randn(2, 50, 3).astype(np.float32)
        idx, d2 = ops.knn(xyz, new, 10, approx_recall=0.95)
        idx = np.asarray(idx)
        assert idx.shape == (2, 50, 10) and np.asarray(d2).shape == (2, 50, 10)
        ref_i = np.asarray(ops.knn(xyz, new, 10)[0])
        overlap = np.mean(
            [
                len(set(idx[b, q]) & set(ref_i[b, q])) / 10.0
                for b in range(2)
                for q in range(50)
            ]
        )
        assert overlap >= 0.9, overlap

    def test_pairwise_rejects_mismatched_widths(self, rng):
        x = rng.rand(1, 5, 3).astype(np.float32)
        y = rng.rand(1, 7, 4).astype(np.float32)
        with pytest.raises(ValueError, match="coordinate widths differ"):
            ops.pairwise_sqdist(x, y)

    def test_self_query(self, rng):
        xyz = rng.randn(1, 50, 3).astype(np.float32)
        idx, d2 = ops.knn(xyz, None, 1)
        # nearest neighbour of each point is itself
        np.testing.assert_array_equal(np.asarray(idx)[0, :, 0], np.arange(50))
        np.testing.assert_allclose(np.asarray(d2)[0, :, 0], 0.0, atol=1e-5)

    def test_dilated_keeps_nearest_k(self, rng):
        xyz = rng.randn(1, 64, 3).astype(np.float32)
        idx = ops.dilated_knn(xyz, None, 8, dilation=2)
        ref, _ = ops.knn(xyz, None, 8)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref))

    def test_dilated_permutation_same_set(self, rng):
        xyz = rng.randn(1, 64, 3).astype(np.float32)
        key = jax.random.PRNGKey(3)
        idx = np.asarray(ops.dilated_knn(xyz, None, 8, dilation=2, key=key))
        ref = np.asarray(ops.knn(xyz, None, 8)[0])
        np.testing.assert_array_equal(np.sort(idx, -1), np.sort(ref, -1))


class TestBallQuery:
    def test_semantics(self, rng):
        xyz = rng.rand(1, 40, 3).astype(np.float32)
        new_xyz = rng.rand(1, 9, 3).astype(np.float32)
        r, k = 0.35, 6
        idx = np.asarray(ops.ball_query(r, k, xyz, new_xyz))[0]
        dm = np_pairwise_sqdist(new_xyz[0], xyz[0])
        for q in range(9):
            in_ball = np.where(dm[q] < r * r)[0]
            if len(in_ball) == 0:
                np.testing.assert_array_equal(idx[q], 0)
                continue
            expect = list(in_ball[:k])
            pad = expect[0]
            while len(expect) < k:
                expect.append(pad)
            np.testing.assert_array_equal(idx[q], expect)


class TestGatherGroup:
    def test_gather(self, rng):
        feats = rng.randn(2, 10, 4).astype(np.float32)
        idx = rng.randint(0, 10, size=(2, 5)).astype(np.int32)
        got = np.asarray(ops.gather(feats, idx))
        for b in range(2):
            np.testing.assert_array_equal(got[b], feats[b][idx[b]])

    def test_group(self, rng):
        feats = rng.randn(2, 10, 4).astype(np.float32)
        idx = rng.randint(0, 10, size=(2, 5, 3)).astype(np.int32)
        got = np.asarray(ops.group(feats, idx))
        for b in range(2):
            np.testing.assert_array_equal(got[b], feats[b][idx[b]])

    def test_group_grad_is_scatter_add(self, rng):
        # replaces the CUDA grouping backward kernel
        feats = rng.randn(1, 6, 2).astype(np.float32)
        idx = np.array([[[0, 0, 1], [2, 3, 3]]], dtype=np.int32)
        g = jax.grad(lambda f: jnp.sum(ops.group(f, idx)))(feats)
        counts = np.zeros(6)
        for i in idx.ravel():
            counts[i] += 1
        np.testing.assert_allclose(np.asarray(g)[0, :, 0], counts, atol=1e-6)


class TestFPS:
    @pytest.mark.parametrize("n,m", [(64, 16), (200, 50), (1024, 128)])
    def test_vs_numpy(self, rng, n, m):
        xyz = rng.randn(3, n, 3).astype(np.float32)
        got = np.asarray(ops.farthest_point_sample(xyz, m))
        for b in range(3):
            np.testing.assert_array_equal(got[b], np_fps(xyz[b], m))

    def test_first_is_zero_and_unique(self, rng):
        xyz = rng.randn(2, 128, 3).astype(np.float32)
        got = np.asarray(ops.farthest_point_sample(xyz, 32))
        assert (got[:, 0] == 0).all()
        for b in range(2):
            assert len(set(got[b].tolist())) == 32


class TestThreeNN:
    def test_vs_numpy(self, rng):
        unknown = rng.randn(2, 30, 3).astype(np.float32)
        known = rng.randn(2, 12, 3).astype(np.float32)
        dist, idx = ops.three_nn(unknown, known)
        dist, idx = np.asarray(dist), np.asarray(idx)
        for b in range(2):
            dm = np_pairwise_sqdist(unknown[b], known[b])
            ref_idx = np.argsort(dm, 1, kind="stable")[:, :3]
            np.testing.assert_array_equal(idx[b], ref_idx)
            np.testing.assert_allclose(
                dist[b], np.sqrt(np.take_along_axis(dm, ref_idx, 1)), atol=1e-3
            )

    def test_interpolate(self, rng):
        feats = rng.randn(1, 12, 8).astype(np.float32)
        idx = rng.randint(0, 12, (1, 30, 3)).astype(np.int32)
        w = rng.rand(1, 30, 3).astype(np.float32)
        got = np.asarray(ops.three_interpolate(feats, idx, w))
        ref = (feats[0][idx[0]] * w[0][..., None]).sum(1)
        np.testing.assert_allclose(got[0], ref, atol=1e-5)

    def test_interpolate_grads(self, rng):
        feats = rng.randn(1, 5, 3).astype(np.float32)
        idx = rng.randint(0, 5, (1, 7, 3)).astype(np.int32)
        w = rng.rand(1, 7, 3).astype(np.float32)
        from conftest import check_grads
        check_grads(lambda f: ops.three_interpolate(f, idx, w), (feats,))


class TestChamfer:
    def test_vs_numpy(self, rng):
        x = rng.rand(2, 40, 3).astype(np.float32)
        y = rng.rand(2, 25, 3).astype(np.float32)
        d1, d2 = ops.chamfer_sqdists(x, y)
        for b in range(2):
            dm = np_pairwise_sqdist(x[b], y[b])
            np.testing.assert_allclose(np.asarray(d1)[b], dm.min(1), atol=1e-4)
            np.testing.assert_allclose(np.asarray(d2)[b], dm.min(0), atol=1e-4)

    def test_l1_reduction(self, rng):
        x = rng.rand(2, 40, 3).astype(np.float32)
        y = rng.rand(2, 25, 3).astype(np.float32)
        d1, d2 = ops.chamfer_sqdists(x, y)
        expect = (np.sqrt(np.asarray(d1)).mean() + np.sqrt(np.asarray(d2)).mean()) / 2
        np.testing.assert_allclose(float(ops.chamfer_l1(x, y)), expect, atol=1e-4)

    def test_gradcheck(self, rng):
        # replaces libs/chamfer_dist/test.py torch.autograd.gradcheck
        x = rng.rand(1, 8, 3).astype(np.float64)
        y = rng.rand(1, 9, 3).astype(np.float64)
        from conftest import check_grads
        check_grads(ops.chamfer_l2, (x, y))


class TestEMD:
    def test_assignment_valid_and_near_optimal(self, rng):
        from scipy.optimize import linear_sum_assignment

        x = rng.rand(2, 32, 3).astype(np.float32)
        y = rng.rand(2, 32, 3).astype(np.float32)
        dist, assign = ops.auction_emd(x, y, 0.004, 2000)
        dist, assign = np.asarray(dist), np.asarray(assign)
        for b in range(2):
            # verify distances against assignment (emd_module.py test_emd pattern)
            ref = ((x[b] - y[b][assign[b]]) ** 2).sum(-1)
            np.testing.assert_allclose(dist[b], ref, atol=1e-4)
            # converged auction => a permutation
            assert len(set(assign[b].tolist())) == 32
            # near-optimality: eps-auction is within n*eps of optimal matching
            cost = np_pairwise_sqdist(x[b], y[b])
            r, c = linear_sum_assignment(np.sqrt(cost))
            opt = np.sqrt(cost)[r, c].sum()
            got = np.sqrt(dist[b]).sum()
            assert got <= opt + 32 * 0.004 * 3 + 1e-3

    def test_identity_clouds(self, rng):
        x = rng.rand(1, 16, 3).astype(np.float32)
        dist, assign = ops.auction_emd(x, x.copy(), 0.001, 2000)
        assert float(np.asarray(dist).sum()) < 1e-3

    def test_grad_wrt_xyz1_only(self, rng):
        x = rng.rand(1, 8, 3).astype(np.float32)
        y = rng.rand(1, 8, 3).astype(np.float32)

        def loss(a, b):
            d, _ = ops.auction_emd(a, b, 0.01, 500)
            return jnp.sum(d)

        gx, gy = jax.grad(loss, argnums=(0, 1))(x, y)
        assert float(jnp.abs(gy).sum()) == 0.0
        assert float(jnp.abs(gx).sum()) > 0.0

    def test_chunked_bitmatches_dense(self, rng):
        """Row-chunked value sweeps reduce the same numbers in chunks —
        the assignment and distances must be identical to the dense
        path (VERDICT round 1 item 7)."""
        x = rng.rand(2, 64, 3).astype(np.float32)
        y = rng.rand(2, 64, 3).astype(np.float32)
        d_dense, a_dense = ops.auction_emd(x, y, 0.005, 500, row_chunk=64)
        for chunk in (8, 16, 32):
            d_c, a_c = ops.auction_emd(x, y, 0.005, 500, row_chunk=chunk)
            np.testing.assert_array_equal(np.asarray(a_dense), np.asarray(a_c))
            np.testing.assert_array_equal(np.asarray(d_dense), np.asarray(d_c))

    def test_auto_chunk_selection(self):
        from patchaugnet_tpu.ops.emd import _VALUE_BUDGET, _pick_row_chunk

        # small problems stay dense
        assert _pick_row_chunk(2, 64) == 64
        # batched full clouds chunk down under the live-memory budget
        chunk = _pick_row_chunk(4, 4096)
        assert chunk < 4096 and 4 * chunk * 4096 <= _VALUE_BUDGET
        assert 4096 % chunk == 0
        # non-power-of-two clouds still honour the budget (largest
        # divisor of n that fits; 1 always divides)
        for b, n in [(1, 9999), (32, 4095), (8, 7919)]:  # 7919 prime
            chunk = _pick_row_chunk(b, n)
            assert n % chunk == 0
            assert b * chunk * n <= _VALUE_BUDGET or chunk == 1

    def test_explicit_bad_row_chunk_rejected(self, rng):
        """An explicit row_chunk that does not divide n must fail loudly
        instead of silently materialising the dense value matrix."""
        x = rng.rand(1, 96, 3).astype(np.float32)
        y = rng.rand(1, 96, 3).astype(np.float32)
        with pytest.raises(ValueError, match="does not divide"):
            ops.auction_emd(x, y, 0.01, 10, row_chunk=40)

    def test_unass_floor_quality(self, rng):
        """Convergence-aware exit (VERDICT r4 next #3): unass_floor
        trades the auction's slow tail for force-assigned stragglers.
        The result self-verifies (dist recomputed from the assignment),
        stays in range, keeps >= n - floor unique assignments, and the
        mean matched distance deviation from the exact mode scales with
        the forced fraction (_study_emd_modes.py at n=4096: 1% floor ->
        ~5%, 3% -> ~16%); at this test's 3% floor the bound is 25%."""
        n = 64
        x = rng.rand(2, n, 3).astype(np.float32)
        y = rng.rand(2, n, 3).astype(np.float32)
        d0, _ = ops.auction_emd(x, y, 0.004, 2000)
        floor = 2
        d, a = ops.auction_emd(x, y, 0.004, 2000, unass_floor=floor)
        d, a = np.asarray(d), np.asarray(a)
        assert ((a >= 0) & (a < n)).all()
        for b in range(2):
            ref = ((x[b] - y[b][a[b]]) ** 2).sum(-1)
            np.testing.assert_allclose(d[b], ref, atol=1e-5)
            assert len(set(a[b].tolist())) >= n - floor
        rel = abs(float(d.mean()) / float(np.asarray(d0).mean()) - 1)
        assert rel < 0.25, rel

    def test_unass_floor_zero_is_reference_path(self, rng):
        """floor=0 + no schedule is bit-identical to the legacy call."""
        x = rng.rand(1, 48, 3).astype(np.float32)
        y = rng.rand(1, 48, 3).astype(np.float32)
        d0, a0 = ops.auction_emd(x, y, 0.005, 300)
        d1, a1 = ops.auction_emd(
            x, y, 0.005, 300, unass_floor=0, eps_schedule=(1.0,)
        )
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))

    def test_eps_schedule_quality(self, rng):
        """Opt-in eps-scaling: phases converge to the same quality band
        as the exact fixed-eps run, with a valid self-verified result."""
        n = 64
        x = rng.rand(2, n, 3).astype(np.float32)
        y = rng.rand(2, n, 3).astype(np.float32)
        d0, _ = ops.auction_emd(x, y, 0.004, 2000)
        d, a = ops.auction_emd(
            x, y, 0.004, 2000, unass_floor=2, eps_schedule=(10.0, 1.0)
        )
        d, a = np.asarray(d), np.asarray(a)
        assert ((a >= 0) & (a < n)).all()
        for b in range(2):
            ref = ((x[b] - y[b][a[b]]) ** 2).sum(-1)
            np.testing.assert_allclose(d[b], ref, atol=1e-5)
            assert len(set(a[b].tolist())) >= n - 4
        rel = abs(float(d.mean()) / float(np.asarray(d0).mean()) - 1)
        assert rel < 0.15, rel

    def test_floor_grad_still_flows(self, rng):
        x = rng.rand(1, 32, 3).astype(np.float32)
        y = rng.rand(1, 32, 3).astype(np.float32)

        def loss(a):
            d, _ = ops.auction_emd(a, y, 0.01, 200, unass_floor=4)
            return jnp.sum(d)

        g = jax.grad(loss)(x)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0.0


class TestLabelStat:
    def test_labelstat_ballrange(self, rng):
        xyz = rng.rand(1, 30, 3).astype(np.float32)
        new_xyz = rng.rand(1, 5, 3).astype(np.float32)
        labels = rng.randint(0, 4, 30)
        stat = np.eye(4, dtype=np.int32)[labels][None]
        got = np.asarray(ops.labelstat_ballrange(0.4, xyz, new_xyz, stat))[0]
        dm = np_pairwise_sqdist(new_xyz[0], xyz[0])
        for q in range(5):
            members = np.where(dm[q] < 0.16)[0]
            expect = np.bincount(labels[members], minlength=4)
            np.testing.assert_array_equal(got[q], expect)

    def test_labelstat_idx(self, rng):
        stat = rng.randint(0, 3, (1, 10, 4)).astype(np.int32)
        idx = rng.randint(0, 10, (1, 6, 3)).astype(np.int32)
        got = np.asarray(ops.labelstat_idx(stat, idx))[0]
        for q in range(6):
            np.testing.assert_array_equal(got[q], stat[0][idx[0, q]].sum(0))

    def test_featuredistribute_gather(self, rng):
        max_xyz = rng.rand(1, 8, 3).astype(np.float32)
        xyz = rng.rand(1, 20, 3).astype(np.float32)
        didx = np.asarray(ops.featuredistribute(max_xyz, xyz))[0]
        dm = np_pairwise_sqdist(xyz[0], max_xyz[0])
        np.testing.assert_array_equal(didx, dm.argmin(1))
        feats = rng.rand(1, 8, 5).astype(np.float32)
        gathered = np.asarray(ops.featuregather(feats, didx[None]))[0]
        np.testing.assert_array_equal(gathered, feats[0][didx])


class TestGroupers:
    """Direct oracle tests for the public grouper/export surface
    (reference pointops.py:476-661) — previously exercised only through
    the model forwards."""

    def test_query_and_group_semantics(self, rng):
        xyz = rng.rand(2, 40, 3).astype(np.float32)
        feats = rng.rand(2, 40, 5).astype(np.float32)
        new_xyz = rng.rand(2, 7, 3).astype(np.float32)
        out = np.asarray(ops.query_and_group(
            jnp.asarray(xyz), jnp.asarray(new_xyz), jnp.asarray(feats),
            nsample=6,
        ))
        idx = np.asarray(ops.knn(xyz, new_xyz, 6)[0])
        for b in range(2):
            for q in range(7):
                g_xyz = xyz[b][idx[b, q]] - new_xyz[b, q]   # centred coords
                g_f = feats[b][idx[b, q]]                   # NOT centred
                np.testing.assert_allclose(out[b, q, :, :3], g_xyz, rtol=1e-5)
                np.testing.assert_allclose(out[b, q, :, 3:], g_f, rtol=1e-5)

    def test_query_and_group_edge_semantics(self, rng):
        xyz = rng.rand(2, 40, 3).astype(np.float32)
        feats = rng.rand(2, 40, 5).astype(np.float32)
        new_xyz = rng.rand(2, 7, 3).astype(np.float32)
        center = rng.rand(2, 7, 5).astype(np.float32)
        res = ops.query_and_group_edge(
            jnp.asarray(xyz), jnp.asarray(new_xyz), jnp.asarray(feats),
            jnp.asarray(center), nsample=6,
        )
        out = np.asarray(res.new_features)
        idx = np.asarray(res.sample_idx)
        np.testing.assert_array_equal(idx, np.asarray(ops.knn(xyz, new_xyz, 6)[0]))
        for b in range(2):
            for q in range(7):
                np.testing.assert_allclose(
                    out[b, q, :, :3], xyz[b][idx[b, q]] - new_xyz[b, q], rtol=1e-5
                )
                # EdgeConv: features centred on the query's own feature
                np.testing.assert_allclose(
                    out[b, q, :, 3:], feats[b][idx[b, q]] - center[b, q], rtol=1e-5
                )
        # un-centred grouped coordinates pass through
        np.testing.assert_allclose(
            np.asarray(res.grouped_xyz)[0, 0], xyz[0][idx[0, 0]], rtol=1e-6
        )

    def test_group_all(self, rng):
        xyz = rng.rand(2, 9, 3).astype(np.float32)
        feats = rng.rand(2, 9, 4).astype(np.float32)
        out = np.asarray(ops.group_all(jnp.asarray(xyz), jnp.asarray(feats)))
        assert out.shape == (2, 1, 9, 7)
        np.testing.assert_allclose(out[:, 0, :, :3], xyz, rtol=1e-6)
        np.testing.assert_allclose(out[:, 0, :, 3:], feats, rtol=1e-6)

    def test_knn_exclude_self(self, rng):
        xyz = rng.rand(1, 30, 3).astype(np.float32)
        idx = np.asarray(ops.knn_exclude_self(jnp.asarray(xyz), None, 4))
        full = np.asarray(ops.knn(xyz, None, 5)[0])
        np.testing.assert_array_equal(idx, full[..., 1:])   # ranks 1..k
        assert not (idx == np.arange(30)[None, :, None]).any()

    def test_self_sqdist_zero_diagonal(self, rng):
        x = rng.rand(1, 12, 3).astype(np.float32)
        d = np.asarray(ops.self_sqdist(jnp.asarray(x)))
        np.testing.assert_array_equal(np.diagonal(d[0]), 0.0)
        ref = np_pairwise_sqdist(x[0], x[0])
        np.fill_diagonal(ref, 0.0)
        np.testing.assert_allclose(d[0], ref, atol=1e-5)

    def test_interpolate_features_matches_manual(self, rng):
        unknown = rng.rand(1, 20, 3).astype(np.float32)
        known = rng.rand(1, 8, 3).astype(np.float32)
        feats = rng.rand(1, 8, 6).astype(np.float32)
        out = np.asarray(ops.interpolate_features(
            jnp.asarray(unknown), jnp.asarray(known), jnp.asarray(feats)
        ))
        dist, idx = ops.three_nn(unknown, known)
        dist, idx = np.asarray(dist), np.asarray(idx)
        recip = 1.0 / (dist + 1e-8)
        w = recip / recip.sum(-1, keepdims=True)
        ref = np.einsum("nk,nkc->nc", w[0], feats[0][idx[0]])
        np.testing.assert_allclose(out[0], ref, rtol=1e-4, atol=1e-6)

    def test_chamfer_l2_split(self, rng):
        x = rng.rand(1, 15, 3).astype(np.float32)
        y = rng.rand(1, 11, 3).astype(np.float32)
        a, b = ops.chamfer_l2_split(jnp.asarray(x), jnp.asarray(y))
        dm = np_pairwise_sqdist(x[0], y[0])
        np.testing.assert_allclose(float(a), dm.min(1).mean(), rtol=1e-5)
        np.testing.assert_allclose(float(b), dm.min(0).mean(), rtol=1e-5)


class TestGatherChunking:
    def test_chunked_path_bit_exact(self, rng):
        """gather() splits into batch chunks past the XLA
        serialized-gather cliff (>~1.5M indices / >~48MB tables); the
        chunked result must be bit-identical to the flat path."""
        from patchaugnet_tpu.ops.grouping import gather, _gather_flat

        feats = jnp.asarray(rng.rand(4, 1000, 2).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 1000, (4, 500_000)).astype(np.int32))
        out = gather(feats, idx)          # 2M indices -> chunked
        ref = _gather_flat(feats, idx)
        assert out.dtype == ref.dtype and out.shape == ref.shape
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_small_shapes_unchunked(self, rng):
        from patchaugnet_tpu.ops.grouping import gather

        feats = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 64, (2, 128)).astype(np.int32))
        out = np.asarray(gather(feats, idx))
        exp = np.asarray(feats)[np.arange(2)[:, None], np.asarray(idx)]
        np.testing.assert_array_equal(out, exp)

    def test_pcr_debug_oob_canary(self, rng, monkeypatch):
        """ADVICE r4: production mode='clip' silently reads a clamped
        row on out-of-range indices; under PCR_DEBUG=1 the OOB rows are
        poisoned with NaN so index-range bugs fail loudly in tests.
        In-range results are untouched."""
        from patchaugnet_tpu.ops.grouping import gather

        feats = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
        idx = np.asarray(rng.randint(0, 64, (2, 16)), np.int32)
        idx[0, 3] = 64        # one-past-end
        idx[1, 7] = -2        # negative
        monkeypatch.setenv("PCR_DEBUG", "1")
        out = np.asarray(gather(feats, jnp.asarray(idx)))
        assert np.isnan(out[0, 3]).all() and np.isnan(out[1, 7]).all()
        ok = np.ones(idx.shape, bool)
        ok[0, 3] = ok[1, 7] = False
        exp = np.asarray(feats)[np.arange(2)[:, None], np.clip(idx, 0, 63)]
        np.testing.assert_array_equal(out[ok], exp[ok])
        monkeypatch.setenv("PCR_DEBUG", "0")
        out2 = np.asarray(gather(feats, jnp.asarray(idx)))
        assert np.isfinite(out2).all()

