"""Tests for the auxiliary NN blocks (rerank/pose-est support library)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from patchaugnet_tpu import nn as pnn


def _run(module, *args, **kwargs):
    v = module.init(jax.random.PRNGKey(0), *args, **kwargs)
    return module.apply(v, *args, **kwargs)


class TestAttentionBlocks:
    def test_se_attention(self, rng):
        x = jnp.asarray(rng.rand(2, 49, 64).astype(np.float32))
        out = _run(pnn.SEAttention(64, reduction=8), x)
        assert out.shape == x.shape

    def test_cbam(self, rng):
        x = jnp.asarray(rng.rand(2, 32, 64).astype(np.float32))
        out = _run(pnn.CBAM(64), x)
        assert out.shape == x.shape

    def test_spatial_attention_softmax(self, rng):
        x = jnp.asarray(rng.rand(2, 32, 16).astype(np.float32))
        m = pnn.SpatialAttention()
        v = m.init(jax.random.PRNGKey(0), x, return_attn=True)
        out, att = m.apply(v, x, return_attn=True)
        np.testing.assert_allclose(np.asarray(att.sum(axis=1)), 1.0, atol=1e-5)


class TestGeM:
    def test_range(self, rng):
        x = jnp.asarray(rng.rand(2, 100, 8).astype(np.float32))
        out = _run(pnn.GeMPooling(), x)
        assert out.shape == (2, 8)
        # GeM with p=3 lies between mean and max
        assert (np.asarray(out) >= np.asarray(x.mean(1)) - 1e-5).all()
        assert (np.asarray(out) <= np.asarray(x.max(1)) + 1e-5).all()


class TestPosEmb:
    def test_shape_and_values(self):
        idx = jnp.arange(5.0)
        emb = pnn.sinusoidal_positional_embedding(idx, 8)
        assert emb.shape == (5, 8)
        # index 0 -> sin=0, cos=1 interleaved
        np.testing.assert_allclose(np.asarray(emb[0]), [0, 1, 0, 1, 0, 1, 0, 1], atol=1e-6)


class TestTransformer:
    def test_encoder_layer(self, rng):
        x = jnp.asarray(rng.rand(2, 16, 32).astype(np.float32))
        layer = pnn.TransformerEncoderLayer(32, 4, dim_feedforward=64)
        out = _run(layer, x)
        assert out.shape == x.shape

    def test_linformer_variant(self, rng):
        x = jnp.asarray(rng.rand(2, 64, 32).astype(np.float32))
        layer = pnn.TransformerEncoderLayer(32, 4, dim_feedforward=64,
                                            linear_attention_k=16)
        out = _run(layer, x)
        assert out.shape == x.shape

    def test_attentional_gnn(self, rng):
        x0 = jnp.asarray(rng.rand(2, 10, 32).astype(np.float32))
        x1 = jnp.asarray(rng.rand(2, 12, 32).astype(np.float32))
        gnn = pnn.AttentionalGNN(32, layer_types=("self", "cross"))
        o0, o1 = _run(gnn, x0, x1)
        assert o0.shape == x0.shape and o1.shape == x1.shape


class TestGeoEncoders:
    """feat_processor.py geometric encoders (VERDICT round 1 item 9)."""

    def _pts(self, rng, b=2, n=16):
        return jnp.asarray(rng.rand(b, n, 3).astype(np.float32))

    def test_abs_coord(self, rng):
        from patchaugnet_tpu.nn import AbsCoordEncoder

        x = self._pts(rng)
        enc = AbsCoordEncoder(8)
        out = enc.apply(enc.init(jax.random.PRNGKey(0), x), x)
        assert out.shape == (2, 16, 8)
        assert bool((out >= 0).all())  # post-ReLU

    def test_distance_encoder_invariances(self, rng):
        from patchaugnet_tpu.nn import DistanceEncoder

        x = self._pts(rng)
        enc = DistanceEncoder(8)
        v = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(v, x)
        assert out.shape == (2, 16, 8)
        # translation invariance (centres + pairwise distances)
        out_t = enc.apply(v, x + 5.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_t), atol=1e-4)
        # max_dist clamp changes the embedding
        enc2 = DistanceEncoder(8, max_dist=0.1)
        out_c = enc2.apply(v, x)
        assert not np.allclose(np.asarray(out), np.asarray(out_c))

    def test_angle_encoder_matches_numpy_nn_angle(self, rng):
        from patchaugnet_tpu.nn import AngleEncoder, nn_angle_jax
        from patchaugnet_tpu.utils.geometry import nn_angle

        x = rng.rand(2, 12, 3).astype(np.float32)
        got = np.asarray(nn_angle_jax(jnp.asarray(x), 3))
        ref = nn_angle(x, 3)
        np.testing.assert_allclose(got, ref, atol=1e-5)
        enc = AngleEncoder(8, angle_k=3)
        xj = jnp.asarray(x)
        out = enc.apply(enc.init(jax.random.PRNGKey(0), xj), xj)
        assert out.shape == (2, 12, 8)

    @pytest.mark.parametrize(
        "encode_type", ["abs_coord", "nn_dist", "nn_angle", "dist_and_angle"]
    )
    def test_geo_encoder_dispatch(self, rng, encode_type):
        from patchaugnet_tpu.nn import GeoEncoder

        x = self._pts(rng)
        enc = GeoEncoder(encode_type, 8)
        out = enc.apply(enc.init(jax.random.PRNGKey(0), x), x)
        assert out.shape == (2, 16, 8)
        assert bool(jnp.isfinite(out).all())


class TestFeatProcessors:
    """SingleFeatProcessor / PairwiseFeatProcessor
    (feat_processor.py:191-353)."""

    CFG = {
        "embed_dim": 16, "local_dim": 8, "global_dim": 8, "num_local": 12,
        "cluster_size": 4, "use_geo_encoder": True,
        "geo_encode_type": "nn_dist", "add_or_cat": "cat",
        "use_vlad": True, "layer_names": ["self", "self"],
        "use_pool": True, "pool": "gem",
    }

    def _inputs(self, rng, b=2, n=12, d=8):
        return (
            jnp.asarray(rng.rand(b, d).astype(np.float32)),
            jnp.asarray(rng.rand(b, n, d).astype(np.float32)),
            jnp.asarray(rng.rand(b, n, 3).astype(np.float32)),
        )

    @pytest.mark.parametrize("pool", ["avg", "max", "gem"])
    def test_single_pooled(self, rng, pool):
        from patchaugnet_tpu.nn import SingleFeatProcessor

        cfg = dict(self.CFG, pool=pool)
        g, l, p = self._inputs(rng)
        proc = SingleFeatProcessor(cfg)
        v = proc.init(jax.random.PRNGKey(0), g, l, p)
        out = proc.apply(v, g, l, p)
        assert out.shape == (2, cfg["embed_dim"])
        assert bool(jnp.isfinite(out).all())

    def test_single_unpooled_out_dim(self, rng):
        from patchaugnet_tpu.nn import SingleFeatProcessor

        cfg = dict(self.CFG, use_pool=False)
        g, l, p = self._inputs(rng)
        proc = SingleFeatProcessor(cfg)
        v = proc.init(jax.random.PRNGKey(0), g, l, p)
        out = proc.apply(v, g, l, p)
        # vlad-aggregated: (B, cluster_size, embed_dim)
        assert out.shape == (2, cfg["cluster_size"], cfg["embed_dim"])
        assert proc.out_dim == cfg["cluster_size"] * cfg["embed_dim"]

    @pytest.mark.parametrize("add_or_cat", ["add", "cat", "none"])
    def test_single_global_modes(self, rng, add_or_cat):
        from patchaugnet_tpu.nn import SingleFeatProcessor

        d = 16 if add_or_cat == "add" else 8
        cfg = dict(self.CFG, add_or_cat=add_or_cat, local_dim=d,
                   global_dim=d, use_geo_encoder=False, use_vlad=False,
                   layer_names=[])
        g = jnp.asarray(rng.rand(2, d).astype(np.float32))
        l = jnp.asarray(rng.rand(2, 12, d).astype(np.float32))
        p = jnp.asarray(rng.rand(2, 12, 3).astype(np.float32))
        proc = SingleFeatProcessor(cfg)
        v = proc.init(jax.random.PRNGKey(0), g, l, p)
        assert proc.apply(v, g, l, p).shape == (2, cfg["embed_dim"])

    def test_pairwise_cross_attention(self, rng):
        from patchaugnet_tpu.nn import PairwiseFeatProcessor

        cfg = dict(self.CFG, layer_names=["self", "cross"])
        g, l, p = self._inputs(rng)
        g2, l2, p2 = self._inputs(np.random.RandomState(1))
        proc = PairwiseFeatProcessor(cfg)
        v = proc.init(jax.random.PRNGKey(0), g, l, p, g2, l2, p2)
        xf, yf = proc.apply(v, g, l, p, g2, l2, p2)
        assert xf.shape == yf.shape == (2, cfg["embed_dim"])
        # cross attention: y's content must influence x's output
        xf2, _ = proc.apply(v, g, l, p, g2, l2 * 2.0, p2)
        assert not np.allclose(np.asarray(xf), np.asarray(xf2))
