"""Sparse voxel-table MinkLoc3Dv2 branch (models/minkloc_sparse.py).

The load-bearing test is dense-vs-sparse agreement WITH SHARED
PARAMETERS: the dense branch is sparse-equivalent by construction
(masked BN + mask-zeroed convs, models/minkloc3dv2.py docstring), so
bit-level agreement at stored sites proves the gather convolution
computes the Minkowski convolution sum at the reference's exact
resolution (quantization.py:40-50) without the dense grid's cap.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from patchaugnet_tpu.models import get_model
from patchaugnet_tpu.models.minkloc3dv2 import DenseVoxelFPN, build_minkloc
from patchaugnet_tpu.models import minkloc_sparse as ms

SPARSE_PARAM = {
    "feature_size": 64,
    "output_dim": 64,
    "planes": [16, 32, 16, 8],
    "layers": [1, 1, 1, 1],
    "num_top_down": 2,
    "conv0_kernel_size": 5,
    "block": "ECABasicBlock",
    "pooling": "GeM",
    "coordinates": "cartesian",
    "quantization_step": 0.05,
    "normalize_embeddings": False,
}


class TestQuantizers:
    def test_cartesian_floor_semantics(self, rng):
        """floor(p/step) like ME.sparse_quantize (quantization.py:47)."""
        pts = rng.rand(2, 64, 3).astype(np.float32) * 2 - 1
        step = 0.1
        coords, valid, dims = ms.quantize_cartesian(jnp.asarray(pts), step)
        assert bool(valid.all())
        # shift = ceil(1/0.1) = 10 rounded up to a multiple of 16 (the
        # ME floor-halving alignment — see quantize_cartesian.align)
        expect = np.floor(pts / step).astype(np.int32) + 16
        np.testing.assert_array_equal(np.asarray(coords), expect)
        assert dims == (33, 33, 33)

    def test_cartesian_unique_count_matches_numpy(self, rng):
        pts = rng.rand(1, 200, 3).astype(np.float32) * 2 - 1
        step = 0.1
        coords, valid, dims = ms.quantize_cartesian(jnp.asarray(pts), step)
        table = ms.build_table(coords, valid, dims)
        n_unique = len(np.unique(np.floor(pts[0] / step).astype(np.int64), axis=0))
        assert int(table.mask.sum()) == n_unique
        keys = np.asarray(table.keys[0])
        occ = keys[keys != ms.SENTINEL]
        assert np.all(np.diff(occ) > 0), "keys not strictly ascending"

    def test_polar_semantics(self, rng):
        """theta in degrees via 180 + atan2*180/pi, per-axis steps
        (quantization.py:26-34)."""
        pts = rng.rand(1, 32, 3).astype(np.float32) - 0.5
        steps = (30.0, 0.25, 0.25)
        coords, valid, dims = ms.quantize_polar(jnp.asarray(pts), steps)
        theta = 180.0 + np.arctan2(pts[0, :, 1], pts[0, :, 0]) * 180.0 / np.pi
        np.testing.assert_array_equal(
            np.asarray(coords[0, :, 0]), np.floor(theta / 30.0).astype(np.int32)
        )
        assert bool(valid.all())

    def test_lookup_finds_own_keys(self, rng):
        pts = rng.rand(2, 64, 3).astype(np.float32) * 2 - 1
        coords, valid, dims = ms.quantize_cartesian(jnp.asarray(pts), 0.2)
        table = ms.build_table(coords, valid, dims)
        idx, found = ms.lookup(table.keys, table.keys)
        assert bool((found == table.mask).all())
        np.testing.assert_array_equal(
            np.asarray(idx)[np.asarray(table.mask)],
            np.argwhere(np.asarray(table.mask))[:, 1],
        )


class TestDenseSparseEquivalence:
    def _make_case(self, rng, g=8, n_cap=256, fill=0.3, b=2):
        occ = rng.rand(b, g, g, g) < fill
        grid = jnp.asarray(occ[..., None].astype(np.float32))
        mask = jnp.asarray(occ)
        coords = np.zeros((b, n_cap, 3), np.int32)
        valid = np.zeros((b, n_cap), bool)
        for bi in range(b):
            cc = np.argwhere(occ[bi])
            coords[bi, : len(cc)] = cc
            valid[bi, : len(cc)] = True
        return grid, mask, jnp.asarray(coords), jnp.asarray(valid), (g, g, g)

    @pytest.mark.parametrize("block", ["BasicBlock", "ECABasicBlock", "Bottleneck"])
    def test_fpn_bitmatch_with_shared_params(self, rng, block):
        grid, mask, coords, valid, dims = self._make_case(rng)
        pyr = ms.build_pyramid(
            coords, valid, dims, num_levels=2, num_top_down=1, conv0_kernel_size=5
        )
        feats0 = pyr.tables[0].mask[..., None].astype(jnp.float32)
        kw = dict(out_channels=8, planes=(8, 16), layers=(1, 1),
                  num_top_down=1, block=block)
        dfpn = DenseVoxelFPN(**kw)
        sfpn = ms.SparseVoxelFPN(**kw)
        vd = dfpn.init(jax.random.PRNGKey(0), grid, mask)
        vs = sfpn.init(jax.random.PRNGKey(0), feats0, pyr)
        assert jax.tree_util.tree_structure(vd) == jax.tree_util.tree_structure(vs)
        yd, _ = dfpn.apply(vd, grid, mask)
        ys, out_mask = sfpn.apply(vd, feats0, pyr)   # DENSE params on purpose
        lvl = 1                                      # num_bottom_up - num_top_down
        keys = np.asarray(pyr.tables[lvl].keys)
        tmask = np.asarray(pyr.tables[lvl].mask)
        gdim = dims[0] // 2
        yd_np, ys_np = np.asarray(yd), np.asarray(ys)
        for bi in range(keys.shape[0]):
            sel = tmask[bi]
            k = keys[bi, sel]
            i, j, kk = k // (gdim * gdim), (k // gdim) % gdim, k % gdim
            np.testing.assert_allclose(
                yd_np[bi, i, j, kk], ys_np[bi, sel], atol=1e-5
            )

    def test_train_mode_bn_stats_match(self, rng):
        """Batch statistics (occupied-site mean/var) must agree between
        branches — the running stats feed eval parity."""
        grid, mask, coords, valid, dims = self._make_case(rng)
        pyr = ms.build_pyramid(
            coords, valid, dims, num_levels=2, num_top_down=1, conv0_kernel_size=3
        )
        feats0 = pyr.tables[0].mask[..., None].astype(jnp.float32)
        kw = dict(out_channels=8, planes=(8, 16), layers=(1, 1), num_top_down=1,
                  conv0_kernel_size=3)
        dfpn, sfpn = DenseVoxelFPN(**kw), ms.SparseVoxelFPN(**kw)
        vd = dfpn.init(jax.random.PRNGKey(1), grid, mask)
        (_, _), upd_d = dfpn.apply(
            vd, grid, mask, train=True, mutable=["batch_stats"]
        )
        (_, _), upd_s = sfpn.apply(
            vd, feats0, pyr, train=True, mutable=["batch_stats"]
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            ),
            upd_d["batch_stats"],
            upd_s["batch_stats"],
        )


class TestZRunClipEdge:
    def test_full_capacity_anchor_clip(self, rng):
        """At FULL table capacity a column-centre query can rank past the
        table end (rank = V); the window anchor is clipped, shifting the
        dz=-1 neighbour to window row h0 instead of h0-1. The restricted
        (z, r) routing pairs in routes_from_zmap must include that
        shifted row (derivation in its docstring) — routing checked
        index-for-index, and the conv output against the exact
        conv_neighbor_table oracle."""
        dims = (2, 1, 8)
        coords = jnp.asarray(
            [[[0, 0, 2], [0, 0, 3], [0, 0, 4], [0, 0, 5], [0, 0, 7], [1, 0, 6]]],
            jnp.int32,
        )
        valid = jnp.ones((1, 6), bool)
        table = ms.build_table(coords, valid, dims)
        assert int(table.mask.sum()) == 6          # genuinely full capacity
        # the (dx=+1, dy=0) column centre of site key 7 is key 15 > max
        # key 14 -> rank 6 = V -> anchor clip engages
        rank, _ = ms.lookup_rank(table.keys, jnp.asarray([[15]], jnp.int32))
        assert int(rank[0, 0]) == 6

        zmap = ms.zrun_conv_map(table, dims, 3)
        routes = ms.routes_from_zmap(table.keys, zmap, 1)
        idx, found = ms.conv_neighbor_table(table, dims, 3)
        # the route table must agree tap-for-tap with the oracle
        idx_np, found_np = np.asarray(idx)[0], np.asarray(found)[0]
        src_np = np.asarray(routes.src)[0]
        np.testing.assert_array_equal(
            src_np, np.where(found_np, idx_np, 6)
        )
        feats = jnp.asarray(rng.rand(1, 6, 4).astype(np.float32))
        conv = ms.SparseConv(features=3, kernel=3)
        v = conv.init(jax.random.PRNGKey(0), feats, routes)

        w = np.asarray(v["params"]["kernel"]).reshape(27, 4, 3)
        f = np.asarray(feats)[0]
        ref = np.zeros((6, 3), np.float32)
        for q in range(27):
            ref += (f[idx_np[:, q]] * found_np[:, q][:, None]) @ w[q]
        # both formulations (zrun via Routes, im2col via the bare src
        # table) must match the exact oracle
        out = np.asarray(conv.apply(v, feats, routes))[0]
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
        out_i = np.asarray(conv.apply(v, feats, routes.src))[0]
        np.testing.assert_allclose(out_i, ref, rtol=1e-5, atol=1e-6)
        # the edge contribution is real: key 14 must feed site key 7
        q_edge = (2 * 3 + 1) * 3 + 0               # offset (+1, 0, -1)
        assert found_np[4, q_edge] and idx_np[4, q_edge] == 5


class TestPairRankMerge:
    def test_lookup_rank_pairs_matches_lookup_rank(self, rng):
        """Both signs of every offset from ONE merge must equal the
        direct lookup_rank of keys ± c (round-4 map build)."""
        pts = rng.rand(3, 400, 3).astype(np.float32) * 2 - 1
        coords, valid, dims = ms.quantize_cartesian(jnp.asarray(pts), 0.05)
        t = ms.build_table(coords, valid, dims)
        coffs = jnp.asarray([1, 7, dims[2], dims[1] * dims[2] + 3], jnp.int32)
        fwd, rev = ms.lookup_rank_pairs(t.keys, coffs)
        for p, c in enumerate(np.asarray(coffs)):
            for sign, got in ((1, fwd[:, p]), (-1, rev[:, p])):
                q = jnp.where(
                    t.keys != ms.SENTINEL, t.keys + sign * int(c), ms.SENTINEL
                )
                want, _ = ms.lookup_rank(t.keys, q, with_found=False)
                # padding slots carry arithmetic ranks in the pair path
                # (routing masks them); compare valid slots only
                m = np.asarray(t.mask)
                np.testing.assert_array_equal(
                    np.asarray(got)[m], np.asarray(want)[m]
                )

    def test_downsample_with_ranks_matches_downsample_table(self, rng):
        pts = rng.rand(2, 500, 3).astype(np.float32) * 2 - 1
        coords, valid, dims = ms.quantize_cartesian(jnp.asarray(pts), 0.03)
        t = ms.build_table(coords, valid, dims)
        coarse, cdims, prank = ms.downsample_with_ranks(t, dims)
        want, wdims = ms.downsample_table(t, dims)
        assert cdims == wdims
        np.testing.assert_array_equal(np.asarray(coarse.keys), np.asarray(want.keys))
        # every valid fine site's parent rank points at its halved key
        ck = np.asarray(coarse.keys)
        fine_coords = np.asarray(ms.decompose_keys(t.keys, dims))
        pk = np.asarray(ms.compose_keys(jnp.asarray(fine_coords) // 2, cdims))
        m = np.asarray(t.mask)
        pr = np.asarray(prank)
        for b in range(pr.shape[0]):
            np.testing.assert_array_equal(ck[b][pr[b][m[b]]], pk[b][m[b]])

    def test_upsample_from_ranks_matches_parent_table(self, rng):
        pts = rng.rand(2, 500, 3).astype(np.float32) * 2 - 1
        coords, valid, dims = ms.quantize_cartesian(jnp.asarray(pts), 0.03)
        t = ms.build_table(coords, valid, dims)
        coarse, cdims, prank = ms.downsample_with_ranks(t, dims)
        idx, vmask = ms.upsample_from_ranks(
            prank, t, dims, coarse.keys.shape[1]
        )
        widx, wmask = ms.upsample_parent_table(t, dims, coarse)
        np.testing.assert_array_equal(np.asarray(vmask), np.asarray(wmask))
        m = np.asarray(wmask)
        np.testing.assert_array_equal(np.asarray(idx)[m], np.asarray(widx)[m])


class TestFusedPyramidLookups:
    def test_build_pyramid_matches_standalone_maps(self, rng):
        """build_pyramid merges each table's stride-1 and stride-2
        lookups into ONE rank-merge sort; the resulting routes must be
        identical to the standalone zrun_conv_map/zrun_down_map path."""
        pts = rng.rand(2, 300, 3).astype(np.float32) * 2 - 1
        coords, valid, dims = ms.quantize_cartesian(jnp.asarray(pts), 0.05)
        pyr = ms.build_pyramid(
            coords, valid, dims, num_levels=2, num_top_down=1,
            conv0_kernel_size=5,
        )
        t0 = ms.build_table(coords, valid, dims)
        r0 = ms.routes_from_zmap(t0.keys, ms.zrun_conv_map(t0, dims, 5), 2)
        np.testing.assert_array_equal(
            np.asarray(pyr.conv0_routes.src), np.asarray(r0.src)
        )
        np.testing.assert_array_equal(
            np.asarray(pyr.conv0_routes.anchor), np.asarray(r0.anchor)
        )
        tb, db = t0, dims
        for i in range(2):
            tc, dc = ms.downsample_table(tb, db)
            rd = ms.routes_from_zmap(
                tb.keys, ms.zrun_down_map(tc, dc, tb, db), 0
            )
            np.testing.assert_array_equal(
                np.asarray(pyr.down_routes[i].src), np.asarray(rd.src)
            )
            rb = ms.routes_from_zmap(tc.keys, ms.zrun_conv_map(tc, dc, 3), 1)
            np.testing.assert_array_equal(
                np.asarray(pyr.block_routes[i].src), np.asarray(rb.src)
            )
            tb, db = tc, dc


class TestFormulationEquivalence:
    def test_zrun_matches_im2col_all_map_kinds(self, rng):
        """The two SparseConv gather formulations (wide zrun window +
        int-mask routing vs flat im2col over the routed src table) must
        agree on every map kind the FPN uses: conv0 (k=5 s=1), block
        (k=3 s=1), down (k=2 s=2) — random realistic tables, shared
        parameters."""
        pts = rng.rand(2, 256, 3).astype(np.float32) * 2 - 1
        coords, valid, dims = ms.quantize_cartesian(jnp.asarray(pts), 0.05)
        pyr = ms.build_pyramid(
            coords, valid, dims, num_levels=1, num_top_down=0,
            conv0_kernel_size=5,
        )
        cases = [
            (5, 1, pyr.conv0_routes, pyr.tables[0]),
            (2, 2, pyr.down_routes[0], pyr.tables[0]),
            (3, 1, pyr.block_routes[0], pyr.tables[1]),
        ]
        for k, stride, routes, in_table in cases:
            vcap = in_table.keys.shape[1]
            feats = jnp.asarray(
                rng.rand(2, vcap, 8).astype(np.float32)
            ) * in_table.mask[..., None]
            conv = ms.SparseConv(features=6, kernel=k, stride=stride)
            variables = conv.init(jax.random.PRNGKey(1), feats, routes)
            out_z = np.asarray(conv.apply(variables, feats, routes))
            out_i = np.asarray(conv.apply(variables, feats, routes.src))
            np.testing.assert_allclose(
                out_z, out_i, rtol=1e-5, atol=1e-6,
                err_msg=f"k={k} stride={stride}",
            )


    def test_zrun_matches_im2col_gradients(self, rng):
        """Training runs through whichever formulation is active, so
        autodiff through both must agree (kernel grads accumulate over
        k^3 taps -> loose float tolerance)."""
        pts = rng.rand(2, 256, 3).astype(np.float32) * 2 - 1
        coords, valid, dims = ms.quantize_cartesian(jnp.asarray(pts), 0.05)
        pyr = ms.build_pyramid(
            coords, valid, dims, num_levels=1, num_top_down=0,
            conv0_kernel_size=5,
        )
        routes, tbl = pyr.block_routes[0], pyr.tables[1]
        vcap = tbl.keys.shape[1]
        feats = jnp.asarray(
            rng.rand(2, vcap, 8).astype(np.float32)
        ) * tbl.mask[..., None]
        conv = ms.SparseConv(features=6, kernel=3)
        variables = conv.init(jax.random.PRNGKey(1), feats, routes)

        gz = jax.grad(
            lambda v, f: jnp.sum(conv.apply(v, f, routes) ** 2), (0, 1)
        )(variables, feats)
        gi = jax.grad(
            lambda v, f: jnp.sum(conv.apply(v, f, routes.src) ** 2), (0, 1)
        )(variables, feats)
        np.testing.assert_allclose(
            np.asarray(gz[0]["params"]["kernel"]),
            np.asarray(gi[0]["params"]["kernel"]),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(gz[1]), np.asarray(gi[1]), rtol=1e-4, atol=1e-5
        )


class TestMinkLocSparseModel:
    def test_build_routing(self):
        m = build_minkloc(dict(SPARSE_PARAM))
        assert type(m).__name__ == "MinkLocSparse"
        assert m.quantization_step == 0.05
        d = build_minkloc(dict(SPARSE_PARAM, grid_size=16))
        assert type(d).__name__ == "MinkLocDense"
        d2 = build_minkloc(dict(SPARSE_PARAM, backend="dense"))
        assert type(d2).__name__ == "MinkLocDense"

    def test_reference_step_uncapped(self):
        """The headline fix: 0.01 step builds and runs at native
        resolution (201 cells/dim) — no silent cap."""
        m = build_minkloc(dict(SPARSE_PARAM, quantization_step=0.01))
        assert m.quantization_step == 0.01
        pts = jnp.asarray(
            np.random.RandomState(0).rand(1, 128, 3).astype(np.float32) * 2 - 1
        )
        # shift = ceil(1/0.01) = 100 rounded up to 112 (multiple of 16,
        # the ME floor-halving alignment) -> 225 cells/dim
        coords, valid, dims = ms.quantize_cartesian(pts, 0.01)
        assert dims == (225, 225, 225)
        out = jax.jit(lambda x: m.apply(m.init(jax.random.PRNGKey(0), x), x))(pts)
        assert out.shape == (1, 64)
        assert bool(jnp.isfinite(out).all())

    @pytest.mark.parametrize("pooling", ["GeM", "MAC", "SPoC", "netvlad"])
    def test_poolings(self, rng, pooling):
        model = build_minkloc(dict(SPARSE_PARAM, pooling=pooling))
        x = jnp.asarray(rng.rand(2, 96, 3).astype(np.float32) * 2 - 1)
        v = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(v, x)
        assert out.shape == (2, 64)
        assert bool(jnp.isfinite(out).all())

    def test_grad_flows(self, rng):
        model = get_model("minkloc3dv2", SPARSE_PARAM)
        x = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32) * 2 - 1)
        v = model.init(jax.random.PRNGKey(0), x)

        def loss(params):
            return jnp.sum(model.apply({**v, "params": params}, x) ** 2)

        g = jax.grad(loss)(v["params"])
        tot = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(tot) and tot > 0

    def test_polar(self, rng):
        model = build_minkloc(dict(
            SPARSE_PARAM, coordinates="polar",
            quantization_step=[22.5, 0.25, 0.25],
            planes=[16, 32, 16], layers=[1, 1, 1], num_top_down=1,
        ))
        x = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32) - 0.5)
        v = model.init(jax.random.PRNGKey(0), x)
        assert model.apply(v, x).shape == (1, 64)

    def test_torch_checkpoint_roundtrip_shapes(self, rng):
        """A converter-produced tree (dense layout) must drop straight
        into the sparse model — same tree, same kernel shapes."""
        model = build_minkloc(dict(SPARSE_PARAM, quantization_step=0.1))
        x = jnp.asarray(rng.rand(1, 32, 3).astype(np.float32) * 2 - 1)
        v = model.init(jax.random.PRNGKey(0), x)
        dense = build_minkloc(dict(SPARSE_PARAM, grid_size=16))
        vd = dense.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vd)
        out = model.apply(vd, x)     # dense-initialised tree, sparse model
        assert bool(jnp.isfinite(out).all())


def _surface_clouds(rng, b=2, n=256):
    """Ground plane + one wall: surface geometry, so stride-2 levels
    merge voxels hard (the regime level_capacity is for)."""
    out = []
    for _ in range(b):
        n_g = n // 2
        g = np.stack(
            [rng.rand(n_g) * 2 - 1, rng.rand(n_g) * 2 - 1,
             rng.randn(n_g) * 0.01], axis=-1)
        w = np.stack(
            [rng.rand(n - n_g) * 2 - 1, np.full(n - n_g, 0.3),
             rng.rand(n - n_g) * 0.8], axis=-1)
        out.append(np.concatenate([g, w], 0).astype(np.float32))
    return np.stack(out)


class TestLevelCapacity:
    """Per-level static table capacities (VERDICT r4 next #2)."""

    def test_compacted_bitmatch_full_capacity(self, rng):
        """When every capacity covers the true occupancy, the compacted
        forward is exact vs the uncompacted one with shared params:
        compaction only slices SENTINEL padding off sorted tables, so
        routes, gathered windows, and masked reductions see the same
        stored voxels. Tolerance: narrower tables change XLA's reduce
        lane grouping over the (exactly zero) padding tail — measured
        max 9.3e-10 abs / 1.8e-7 rel, i.e. 1-2 ulps, not semantics."""
        pts = jnp.asarray(_surface_clouds(rng))
        counts = ms.measure_level_occupancy(
            pts, num_levels=4, quantization_step=0.05
        )
        caps = ms.suggest_level_capacities(
            counts, margin=1.1, align=8, full=pts.shape[1]
        )
        assert caps[-1] < pts.shape[1], "surface clouds must merge"
        full = build_minkloc(dict(SPARSE_PARAM))
        compact = build_minkloc(dict(SPARSE_PARAM, level_capacity=caps))
        v = full.init(jax.random.PRNGKey(0), pts)
        ref = np.asarray(full.apply(v, pts))
        out, diag = compact.apply(v, pts, return_diagnostics=True)
        assert int(diag["capacity_overflow"]) == 0
        np.testing.assert_allclose(
            np.asarray(out), ref, rtol=2e-6, atol=1e-8
        )

    def test_overflow_flag_trips(self, rng):
        """Too-small capacities drop the highest-key voxels: the
        diagnostic reports the max dropped count and the output stays
        finite (graceful deterministic degradation, not corruption)."""
        pts = jnp.asarray(_surface_clouds(rng))
        counts = ms.measure_level_occupancy(
            pts, num_levels=4, quantization_step=0.05
        )
        caps = [max(int(counts[:, i].max()) // 2, 8) for i in range(5)]
        model = build_minkloc(dict(SPARSE_PARAM, level_capacity=caps))
        v = model.init(jax.random.PRNGKey(0), pts)
        out, diag = model.apply(v, pts, return_diagnostics=True)
        assert int(diag["capacity_overflow"]) > 0
        assert bool(jnp.isfinite(out).all())

    def test_measure_and_suggest_helpers(self, rng):
        pts = _surface_clouds(rng, b=3)
        counts = ms.measure_level_occupancy(
            pts, num_levels=4, quantization_step=0.05
        )
        assert counts.shape == (3, 5)
        # downsampling maps each fine voxel into one coarse voxel:
        # counts are monotone non-increasing across levels
        assert (np.diff(counts, axis=1) <= 0).all()
        caps = ms.suggest_level_capacities(counts, margin=1.0, align=8)
        for lvl in range(5):
            assert caps[lvl] >= counts[:, lvl].max()
            assert caps[lvl] % 8 == 0

    def test_capacity_grad_flows(self, rng):
        pts = jnp.asarray(_surface_clouds(rng))
        caps = ms.suggest_level_capacities(
            ms.measure_level_occupancy(pts, num_levels=4, quantization_step=0.05),
            margin=1.1, align=8, full=pts.shape[1],
        )
        model = build_minkloc(dict(SPARSE_PARAM, level_capacity=caps))
        v = model.init(jax.random.PRNGKey(0), pts)

        def loss(params):
            return jnp.sum(model.apply({**v, "params": params}, pts) ** 2)

        g = jax.grad(loss)(v["params"])
        tot = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(tot) and tot > 0


class TestSparseSmoothAPTraining:
    @pytest.mark.slow
    def test_recall_after_training(self):
        """Quality gate for the exact-resolution branch (VERDICT round 2
        #1): TruncatedSmoothAP training on the synthetic scene must lift
        recall@1 the way the dense 48^3 branch does
        (tests/test_minkloc.py::test_recall_after_training)."""
        import random as _random
        from patchaugnet_tpu import data, train
        from patchaugnet_tpu.train.state import TrainState

        train_scene = data.SceneDataset("synthetic", for_training=True)
        train_scene.create_synthetic(n_trips=2, n_per_trip=16, num_points=64)
        test_scene = data.SceneDataset("synthetic", for_training=False)
        test_scene.create_synthetic(n_trips=2, n_per_trip=16, num_points=64)
        model = build_minkloc(dict(SPARSE_PARAM, quantization_step=0.1))
        fwd = jax.jit(lambda v, c: model.apply(v, c, train=False))

        def recall1(variables):
            test_scene.make_descs(
                lambda c: fwd(variables, jnp.asarray(c)), batch_size=8
            )
            res = test_scene.recall_precision_all(top_k=5)
            return float(np.mean([r.recall[0] for r in res.values()]))

        clouds0, _ = train_scene.get_clouds(list(range(8)))
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(clouds0))
        r_init = recall1(variables)
        sched = train.multistep_schedule(1e-3, [250], steps_per_epoch=10)
        step, tx = train.build_smoothap_train_step(
            model, sched, weight_decay=1e-4, positives_per_query=2
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]), tx=tx,
        )
        rng = _random.Random(0)
        for _ in range(40):
            bidx = train.sample_smoothap_batch(train_scene, 8, rng)
            pos, neg = train.build_masks(train_scene, bidx)
            clouds, _ = train_scene.get_clouds(bidx)
            state, _stats = step(
                state, jnp.asarray(clouds), jnp.asarray(pos), jnp.asarray(neg)
            )
        r_trained = recall1(
            {"params": state.params, "batch_stats": state.batch_stats}
        )
        assert r_trained >= 85.0, (r_init, r_trained)
        assert r_trained >= r_init + 20.0, (r_init, r_trained)

    def test_loss_decreases_on_synthetic(self):
        from patchaugnet_tpu import data, train
        from patchaugnet_tpu.train.state import TrainState
        import random as _random

        scene = data.SceneDataset("synthetic", for_training=True)
        scene.create_synthetic(n_trips=2, n_per_trip=12, num_points=64)
        model = build_minkloc(dict(SPARSE_PARAM, quantization_step=0.1))
        rng = _random.Random(0)
        batch_idx = train.sample_smoothap_batch(scene, 8, rng)
        pos, neg = train.build_masks(scene, batch_idx)
        clouds, _ = scene.get_clouds(batch_idx)
        clouds = jnp.asarray(clouds)
        sched = train.multistep_schedule(1e-3, [250], steps_per_epoch=10)
        step, tx = train.build_smoothap_train_step(
            model, sched, weight_decay=1e-4, positives_per_query=2
        )
        variables = model.init(jax.random.PRNGKey(0), clouds)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]), tx=tx,
        )
        losses = []
        for _ in range(8):
            state, stats = step(state, clouds, jnp.asarray(pos), jnp.asarray(neg))
            losses.append(float(stats["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses


class TestComputeDtypeSparse:
    def test_bf16_matches_f32(self, rng):
        """COMPUTE_DTYPE bf16: identical f32 param tree (checkpoint
        compatible), f32 descriptor out, near-f32 fidelity; the voxel
        routing (int32 tables) never sees bf16."""
        import jax.tree_util as jtu
        from patchaugnet_tpu.models.minkloc3dv2 import build_minkloc

        x = jnp.asarray(rng.rand(2, 512, 3).astype(np.float32) * 2 - 1)
        m32 = build_minkloc(dict(SPARSE_PARAM))
        v = jax.jit(m32.init)(jax.random.PRNGKey(0), x)
        m16 = build_minkloc(dict(SPARSE_PARAM, COMPUTE_DTYPE="bfloat16"))
        v16 = jax.jit(m16.init)(jax.random.PRNGKey(0), x)
        spec = lambda t: jtu.tree_map(lambda a: (a.shape, str(a.dtype)), t)
        assert spec(v) == spec(v16)
        o32 = np.asarray(jax.jit(lambda v, a: m32.apply(v, a))(v, x))
        o16 = np.asarray(jax.jit(lambda v, a: m16.apply(v, a))(v, x))
        assert o16.dtype == np.float32
        cos = (o32 * o16).sum(-1) / (
            np.linalg.norm(o32, axis=-1) * np.linalg.norm(o16, axis=-1)
        )
        assert cos.min() > 0.999, cos
