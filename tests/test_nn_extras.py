"""Tests for the auxiliary NN blocks (rerank/pose-est support library)."""
import numpy as np
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
