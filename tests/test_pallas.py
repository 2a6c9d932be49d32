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

    @pytest.mark.parametrize("b,n,m,k,qb", [(2, 256, 128, 8, 64), (1, 304, 64, 20, 64)])
    def test_fused_matches_topk(self, rng, b, n, m, k, qb):
        """The fused kernel (in-kernel distances) must return the exact
        kNN indices; distances may differ from the XLA path by FMA
        rounding in interpret mode (bit-exact on the real chip,
        `_probe_knn_fair.py` 2026-08-20)."""
        from patchaugnet_tpu.ops.pallas.knn import knn_fused_pallas

        x = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))
        q = jnp.asarray(rng.rand(b, m, 3).astype(np.float32))
        ri, rd = knn(x, q, k)
        gi, gd = knn_fused_pallas(x, q, k, query_block=qb, interpret=True)
        np.testing.assert_array_equal(np.asarray(ri), np.asarray(gi))
        np.testing.assert_allclose(np.asarray(rd), np.asarray(gd), atol=1e-6)

    def test_knn_pallas_dispatches_fused_for_3d(self, rng):
        """3-d points at flat-tile scale take the fused kernel inside
        knn_pallas; results must match the XLA reference."""
        x = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
        q = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
        ri, rd = knn(x, q, 8)
        gi, gd = knn_pallas(x, q, 8, query_block=64, interpret=True)
        np.testing.assert_array_equal(np.asarray(ri), np.asarray(gi))
        np.testing.assert_allclose(np.asarray(rd), np.asarray(gd), atol=1e-6)
        # non-3d features must still take the split path (and agree)
        x5 = jnp.asarray(rng.rand(2, 256, 5).astype(np.float32))
        q5 = jnp.asarray(rng.rand(2, 128, 5).astype(np.float32))
        ri5, _ = knn(x5, q5, 8)
        gi5, _ = knn_pallas(x5, q5, 8, query_block=64, interpret=True)
        np.testing.assert_array_equal(np.asarray(ri5), np.asarray(gi5))

    def test_pair_extraction_matches_flat(self, rng):
        """The two-per-round-trip extraction kernel is bit-identical to
        the sequential flat kernel (kept as a probe-backed alternative;
        on-chip it measured within ±5% of flat, `_probe_knn_pair.py`)."""
        from patchaugnet_tpu.ops.pallas.knn import topk_extract_pair_pallas

        d = jnp.asarray(rng.rand(2, 64, 200).astype(np.float32))
        for k in (6, 7):  # even + odd (dead second extraction)
            fi, fv = topk_extract_pair_pallas(d, k, query_block=64, interpret=True)
            ri, rv = topk_extract_pallas(d, k, query_block=64, interpret=True)
            np.testing.assert_array_equal(np.asarray(ri), np.asarray(fi))
            np.testing.assert_array_equal(np.asarray(rv), np.asarray(fv))


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

    def test_price_fused_kernel_bit_matches_materialised(self, rng):
        """The price-fused extraction (auction sweep fast path) must be
        bit-identical to extracting from the materialised
        ``base + price`` sum — same add, performed in VMEM."""
        from patchaugnet_tpu.ops.pallas.knn import (
            topk_extract_pallas,
            topk_extract_price_pallas,
        )

        base = (rng.rand(2, 64, 512).astype(np.float32) - 0.5) * 4
        base[:, :, ::5] = base[:, :, 1:2]                  # ties
        price = rng.rand(2, 512).astype(np.float32) * 2
        for k in (2, 3):                # k=2 lean kernel, k=3 generic loop
            fi, fv = topk_extract_price_pallas(
                jnp.asarray(base), jnp.asarray(price), k, query_block=64,
                interpret=True,
            )
            mat = jnp.asarray(base) + jnp.asarray(price)[:, None, :]
            ri, rv = topk_extract_pallas(mat, k, query_block=64, interpret=True)
            np.testing.assert_array_equal(np.asarray(ri), np.asarray(fi))
            np.testing.assert_array_equal(np.asarray(rv), np.asarray(fv))

    def test_fused_auction_matches_cpu_reference(self, rng, monkeypatch):
        """Forcing the price-fused sweep (interpret mode) through the
        full auction must reproduce the CPU top_k path's assignment
        exactly: ``(d - 3) + p`` and ``-(3 - d - p)`` are the same f32
        value, and tie-breaks agree."""
        from functools import partial as _partial

        import patchaugnet_tpu.ops.emd as emd_mod
        import patchaugnet_tpu.ops.pallas.knn as pk

        x1 = rng.rand(2, 512, 3).astype(np.float32)
        x2 = rng.rand(2, 512, 3).astype(np.float32)
        ref = np.asarray(
            emd_mod._auction(jnp.asarray(x1), jnp.asarray(x2), 0.02, 60)
        )
        monkeypatch.setattr(emd_mod.pallas, "on_tpu", lambda: True)
        monkeypatch.setattr(
            pk,
            "topk_extract_price_pallas",
            _partial(pk.topk_extract_price_pallas, interpret=True),
        )
        got = np.asarray(
            emd_mod._auction(jnp.asarray(x1), jnp.asarray(x2), 0.02, 60)
        )
        np.testing.assert_array_equal(ref, got)

    def test_active_set_tail_is_bit_identical(self, rng, monkeypatch):
        """The active-set sweep (gather + sweep only the unassigned
        rows once every batch element fits in R) must reproduce the
        full-width Jacobi trajectory exactly: same bidder set, same f32
        bid arithmetic, same scatter-max contributions. n=512 with
        R=256 exercises both phases and the phase switch."""
        from functools import partial as _partial

        import patchaugnet_tpu.ops.emd as emd_mod
        import patchaugnet_tpu.ops.pallas.knn as pk

        x1 = rng.rand(2, 512, 3).astype(np.float32)
        x2 = rng.rand(2, 512, 3).astype(np.float32)
        monkeypatch.setattr(emd_mod.pallas, "on_tpu", lambda: True)
        monkeypatch.setattr(
            pk,
            "topk_extract_price_pallas",
            _partial(pk.topk_extract_price_pallas, interpret=True),
        )
        monkeypatch.setattr(
            pk,
            "topk_extract_pallas",
            _partial(pk.topk_extract_pallas, interpret=True),
        )
        monkeypatch.setenv("PCR_EMD_ACTIVE", "off")
        ref = np.asarray(
            emd_mod._auction(jnp.asarray(x1), jnp.asarray(x2), 0.02, 120)
        )
        monkeypatch.setenv("PCR_EMD_ACTIVE", "auto")
        got = np.asarray(
            emd_mod._auction(jnp.asarray(x1), jnp.asarray(x2), 0.02, 120)
        )
        np.testing.assert_array_equal(ref, got)

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
