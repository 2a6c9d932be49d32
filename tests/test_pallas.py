"""Pallas kernel correctness (interpret mode — runs on the CPU suite;
the same kernels are exact-match-verified on real TPU hardware in the
bench/verify flows)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from patchaugnet_tpu.ops.fps import _farthest_point_sample_xla
from patchaugnet_tpu.ops.pallas.fps import farthest_point_sample_pallas
from patchaugnet_tpu.ops.pallas.knn import knn_pallas, topk_extract_pallas
from patchaugnet_tpu.ops.knn import knn, _pallas_query_block


class TestPallasFPS:
    @pytest.mark.parametrize("b,n,m", [(2, 64, 16), (4, 512, 128), (3, 100, 25)])
    def test_matches_xla(self, rng, b, n, m):
        x = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))
        ref = np.asarray(_farthest_point_sample_xla(x, m))
        got = np.asarray(farthest_point_sample_pallas(x, m, interpret=True))
        np.testing.assert_array_equal(ref, got)

    def test_degenerate_cloud(self):
        x = jnp.ones((1, 32, 3))
        got = np.asarray(farthest_point_sample_pallas(x, 8, interpret=True))
        np.testing.assert_array_equal(got, 0)


class TestPallasKNN:
    @pytest.mark.parametrize("b,n,m,k,qb", [(2, 256, 128, 8, 64), (1, 300, 64, 20, 64)])
    def test_matches_topk(self, rng, b, n, m, k, qb):
        x = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))
        q = jnp.asarray(rng.rand(b, m, 3).astype(np.float32))
        ri, rd = knn(x, q, k)
        gi, gd = knn_pallas(x, q, k, query_block=qb, interpret=True)
        np.testing.assert_array_equal(np.asarray(ri), np.asarray(gi))
        np.testing.assert_allclose(np.asarray(rd), np.asarray(gd), atol=1e-5)

    def test_extract_only(self, rng):
        d = jnp.asarray(rng.rand(2, 64, 200).astype(np.float32))
        gi, gv = topk_extract_pallas(d, 7, query_block=64, interpret=True)
        neg, ri = jax.lax.top_k(-d, 7)
        np.testing.assert_array_equal(np.asarray(ri), np.asarray(gi))
        np.testing.assert_allclose(np.asarray(-neg), np.asarray(gv), atol=1e-6)

    def test_query_block_selection(self):
        assert _pallas_query_block(128) == 128
        assert _pallas_query_block(1024) == 256
        assert _pallas_query_block(1000) == 200
        assert _pallas_query_block(257 * 2) is None or 514 % _pallas_query_block(514) == 0


class TestChunkedExtraction:
    def test_exact_with_ties(self, rng):
        from patchaugnet_tpu.ops.pallas.knn import topk_extract_chunked

        d = rng.rand(2, 64, 240).astype(np.float32)
        d[:, :, ::13] = d[:, :, 0:1]                       # inject ties
        gi, gv = topk_extract_chunked(jnp.asarray(d), 9, 64, num_chunks=4,
                                      interpret=True)
        neg, ri = jax.lax.top_k(-jnp.asarray(d), 9)
        np.testing.assert_array_equal(np.asarray(ri), np.asarray(gi))
        np.testing.assert_allclose(np.asarray(-neg), np.asarray(gv), atol=1e-6)

    def test_fallback_when_chunks_too_small(self, rng):
        from patchaugnet_tpu.ops.pallas.knn import topk_extract_chunked

        d = jnp.asarray(rng.rand(1, 32, 40).astype(np.float32))
        gi, _ = topk_extract_chunked(d, 20, 32, interpret=True)
        _, ri = jax.lax.top_k(-d, 20)
        np.testing.assert_array_equal(np.asarray(ri), np.asarray(gi))


class TestEMDTop2Routing:
    def test_top2_desc_matches_top_k(self, rng):
        """The EMD auction's Pallas-routed top-2 sweep (flat and
        VMEM-budget-chunked dispatch) must match lax.top_k exactly,
        ties included — interpret-mode stand-in for the real-TPU path
        the CPU suite can't reach."""
        from patchaugnet_tpu.ops.emd import _top2_desc

        # flat-tile dispatch, with ties and negative values (prices)
        v = (rng.rand(2, 64, 512).astype(np.float32) - 0.5) * 10
        v[:, :, ::7] = v[:, :, 0:1]
        got_v, got_i = _top2_desc(jnp.asarray(v), True, interpret=True)
        ref_v, ref_i = jax.lax.top_k(jnp.asarray(v), 2)
        np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))
        np.testing.assert_allclose(
            np.asarray(ref_v), np.asarray(got_v), atol=1e-6
        )

    def test_top2_desc_chunked_dispatch(self, rng):
        """Rows wide enough to blow the flat VMEM tile budget route
        through the two-level chunked extraction."""
        from patchaugnet_tpu.ops.pallas.knn import _VMEM_TILE_BUDGET
        from patchaugnet_tpu.ops.emd import _top2_desc

        n = 8192
        assert 256 * n > _VMEM_TILE_BUDGET  # must exercise the chunked arm
        v = (rng.rand(1, 256, n).astype(np.float32) - 0.5) * 4
        got_v, got_i = _top2_desc(jnp.asarray(v), True, interpret=True)
        ref_v, ref_i = jax.lax.top_k(jnp.asarray(v), 2)
        np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))
        np.testing.assert_allclose(
            np.asarray(ref_v), np.asarray(got_v), atol=1e-6
        )
