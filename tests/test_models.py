"""Model forward tests: shapes, finiteness, determinism, BN state.

Mirrors the reference's smoke blocks (PointNetVlad.py:250-259 shape
test, loupe.py:364-370) and exercises every aggregation type.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from patchaugnet_tpu.models import get_model, PatchAugNet

# small-N configs for fast CPU tests (structure identical to the yaml)
PATCH_AUG_PARAM = {
    "AGGREGATION": "spvlad",
    "AGGREGATION_TYPE": 2,
    "GROUP": 8,
    "NUM_POINTS": 256,
    "FEATURE_OUTPUT_DIM": 256,
    "FEATURE_SIZE": [256, 256, 256],
    "MAX_SAMPLES": [16, 64, 256],
    "CLUSTER_SIZE": [4, 16, 64],
    "OUTPUT_DIM": [256, 256, 256],
    "USE_ORIGIN_PC_IN_FP": True,
    "GATING": False,
    "SAMPLING": [64, 16, 8],
    "KNN": [10, 10, 8],
    "KNN_DILATION": 2,
    "use_patch_recon": True,
}

PPT_PARAM = {
    "AGGREGATION": "spvlad",
    "GROUP": 8,
    "NUM_POINTS": 256,
    "FEATURE_OUTPUT_DIM": 256,
    "FEATURE_SIZE": [256, 256, 256, 256],
    "MAX_SAMPLES": [16, 32, 64, 256],
    "CLUSTER_SIZE": [1, 4, 16, 64],
    "OUTPUT_DIM": [256, 256, 256, 256],
    "GATING": True,
    "SAMPLING": [64, 32, 16, 8],
    "KNN": [10, 10, 8, 8],
}

PNV_PARAM = {"NUM_POINTS": 256, "FEATURE_OUTPUT_DIM": 256}


def _init_and_run(model, x, **kwargs):
    variables = model.init(jax.random.PRNGKey(0), x, **kwargs)
    out = model.apply(variables, x, **kwargs)
    return variables, out


class TestPointNetVLAD:
    def test_forward_shape(self, rng):
        x = jnp.asarray(rng.rand(3, 256, 3), jnp.float32)
        model = get_model("pointnet_vlad", PNV_PARAM)
        _, out = _init_and_run(model, x)
        assert out.shape == (3, 256)
        assert bool(jnp.isfinite(out).all())

    def test_accepts_b1n3_layout(self, rng):
        x = jnp.asarray(rng.rand(2, 1, 256, 3), jnp.float32)
        model = get_model("pointnet_vlad", PNV_PARAM)
        _, out = _init_and_run(model, x)
        assert out.shape == (2, 256)

    def test_train_mode_updates_batch_stats(self, rng):
        x = jnp.asarray(rng.rand(2, 256, 3), jnp.float32)
        model = get_model("pointnet_vlad", PNV_PARAM)
        variables = model.init(jax.random.PRNGKey(0), x)
        out, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        assert "batch_stats" in mutated
        leaves_before = jax.tree_util.tree_leaves(variables["batch_stats"])
        leaves_after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(leaves_before, leaves_after)
        )
        assert changed


class TestPPTNet:
    @pytest.mark.parametrize("model_type", ["pptnet", "pptnet_l2_norm"])
    def test_forward(self, rng, model_type):
        x = jnp.asarray(rng.rand(2, 256, 3), jnp.float32)
        model = get_model(model_type, PPT_PARAM)
        _, out = _init_and_run(model, x)
        assert out.global_desc.shape == (2, 256)
        shapes = [f.shape for f in out.fp_features]
        assert shapes == [(2, 16, 256), (2, 32, 256), (2, 64, 256), (2, 256, 256)]
        if model_type == "pptnet_l2_norm":
            norms = jnp.linalg.norm(out.global_desc, axis=-1)
            np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-4)

    def test_center_idx_provenance_in_range(self, rng):
        x = jnp.asarray(rng.rand(2, 256, 3), jnp.float32)
        model = get_model("pptnet", PPT_PARAM)
        _, out = _init_and_run(model, x)
        for lvl, c in enumerate(out.center_idx_origin):
            arr = np.asarray(c)
            assert arr.min() >= 0 and arr.max() < 256, lvl


class TestPatchAugNet:
    def test_approx_recall_config(self, rng):
        """KNN_APPROX_RECALL flows through the SA groupers end to end
        (README fast mode): finite normalised descriptor."""
        x = jnp.asarray(rng.rand(2, 256, 3), jnp.float32)
        cfg = dict(PATCH_AUG_PARAM, KNN_APPROX_RECALL=0.95)
        model = get_model("patch_aug_net", cfg)
        _, out = _init_and_run(model, x)
        desc = out.global_desc
        assert desc.shape == (2, 256)
        assert bool(jnp.isfinite(desc).all())

    def test_forward_no_patches(self, rng):
        x = jnp.asarray(rng.rand(2, 256, 3), jnp.float32)
        model = get_model("patch_aug_net", PATCH_AUG_PARAM)
        _, out = _init_and_run(model, x)
        assert out.global_desc.shape == (2, 256)
        assert out.patch_data is None

    def test_forward_with_patches(self, rng):
        x = jnp.asarray(rng.rand(2, 256, 3), jnp.float32)
        model = get_model("patch_aug_net", PATCH_AUG_PARAM)
        _, out = _init_and_run(model, x, with_patches=True)
        pd = out.patch_data
        assert pd.center_indices.shape == (2, 64)
        assert pd.origin_patches.shape == (2, 64, 10, 3)
        assert pd.patch_features.shape == (2, 64, 256)
        assert pd.reconstructed_patches.shape == (2, 64, 10, 3)
        # patch features are L2-normalised (use_l2_norm=True path)
        norms = jnp.linalg.norm(pd.patch_features, axis=-1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-4)
        # origin patches contain raw input coordinates
        xs = np.asarray(x)
        ops_ = np.asarray(pd.origin_patches)
        sidx = np.asarray(out.sample_idx_origin[0])
        np.testing.assert_allclose(ops_[0, 5], xs[0][sidx[0, 5]], atol=1e-6)

    @pytest.mark.parametrize("agg_type", [0, 1, 2, 3, 4, 5])
    def test_all_aggregation_types(self, rng, agg_type):
        x = jnp.asarray(rng.rand(2, 256, 3), jnp.float32)
        param = dict(PATCH_AUG_PARAM, AGGREGATION_TYPE=agg_type)
        model = get_model("patch_aug_net", param)
        _, out = _init_and_run(model, x)
        assert out.global_desc.shape == (2, 256)
        assert bool(jnp.isfinite(out.global_desc).all())

    def test_jit_and_determinism(self, rng):
        x = jnp.asarray(rng.rand(2, 256, 3), jnp.float32)
        model = get_model("patch_aug_net", PATCH_AUG_PARAM)
        variables = model.init(jax.random.PRNGKey(0), x)
        f = jax.jit(lambda v, a: model.apply(v, a).global_desc)
        o1, o2 = f(variables, x), f(variables, x)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def test_grad_flows(self, rng):
        x = jnp.asarray(rng.rand(2, 256, 3), jnp.float32)
        model = get_model("patch_aug_net", PATCH_AUG_PARAM)
        variables = model.init(jax.random.PRNGKey(0), x)

        def loss(params):
            out = model.apply({**variables, "params": params}, x)
            return jnp.sum(out.global_desc ** 2)

        g = jax.grad(loss)(variables["params"])
        total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0


class TestMSGModule:
    def test_multi_scale_concat(self, rng):
        """PointNet2SAModuleMSG: per-scale features concatenate over
        channels, sample indices over the neighbour axis
        (reference patch_aug_net.py:195-289)."""
        import jax
        import jax.numpy as jnp
        from patchaugnet_tpu.models.backbone import PointNet2SAModuleMSG

        xyz = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
        feats = jnp.asarray(rng.rand(2, 64, 8).astype(np.float32))
        msg = PointNet2SAModuleMSG(
            npoint=16, nsamples=(4, 8), mlps=((16, 16), (16, 32)),
        )
        v = msg.init(jax.random.PRNGKey(0), xyz, feats)
        out = msg.apply(v, xyz, feats)
        assert out.new_xyz.shape == (2, 16, 3)
        assert out.sample_idx.shape == (2, 16, 12)      # 4 + 8
        assert out.features.shape == (2, 16, 48)        # 16 + 32
        assert bool(jnp.isfinite(out.features).all())

    def test_single_scale_matches_sa_module(self, rng):
        """With one scale and identical widths, MSG reduces to the
        single-scale module's feature computation."""
        import jax
        import jax.numpy as jnp
        from patchaugnet_tpu.models.backbone import (
            PointNet2SAModule, PointNet2SAModuleMSG,
        )

        xyz = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
        feats = jnp.asarray(rng.rand(2, 64, 8).astype(np.float32))
        sa = PointNet2SAModule(npoint=16, nsample=4, mlp=(16, 16))
        msg = PointNet2SAModuleMSG(npoint=16, nsamples=(4,), mlps=((16, 16),))
        v_sa = sa.init(jax.random.PRNGKey(0), xyz, feats)
        # rename mlp -> mlp0 to feed the same weights to the MSG module
        v_msg = {"params": {"mlp0": v_sa["params"]["mlp"]},
                 "batch_stats": {"mlp0": v_sa["batch_stats"]["mlp"]}}
        out_sa = sa.apply(v_sa, xyz, feats)
        out_msg = msg.apply(v_msg, xyz, feats)
        np.testing.assert_array_equal(
            np.asarray(out_sa.features), np.asarray(out_msg.features)
        )
        np.testing.assert_array_equal(
            np.asarray(out_sa.sample_idx), np.asarray(out_msg.sample_idx)
        )


class TestComputeDtype:
    """COMPUTE_DTYPE bf16 serving path: checkpoint-compatible (identical
    f32 param tree), f32 descriptors out, bit-identical geometry
    (FPS/kNN indices), and near-f32 descriptor fidelity."""

    CASES = [
        ("patch_aug_net", PATCH_AUG_PARAM),
        ("pptnet_l2_norm", PPT_PARAM),
        ("pointnet_vlad", PNV_PARAM),
    ]

    @pytest.mark.parametrize("model_type,base", CASES,
                             ids=[c[0] for c in CASES])
    def test_bf16_matches_f32(self, rng, model_type, base):
        import jax.tree_util as jtu

        x = jnp.asarray(rng.rand(2, 256, 3), jnp.float32)
        m32 = get_model(model_type, base)
        v = jax.jit(m32.init)(jax.random.PRNGKey(0), x)
        m16 = get_model(model_type, dict(base, COMPUTE_DTYPE="bfloat16"))
        v16 = jax.jit(m16.init)(jax.random.PRNGKey(0), x)
        # same tree -> f32 checkpoints restore into the bf16 model as-is
        spec = lambda t: jtu.tree_map(lambda a: (a.shape, str(a.dtype)), t)
        assert spec(v) == spec(v16)

        o32 = jax.jit(lambda v, a: m32.apply(v, a))(v, x)
        o16 = jax.jit(lambda v, a: m16.apply(v, a))(v, x)
        d32 = o32 if model_type == "pointnet_vlad" else o32.global_desc
        d16 = o16 if model_type == "pointnet_vlad" else o16.global_desc
        assert d16.dtype == jnp.float32
        d32, d16 = np.asarray(d32), np.asarray(d16)
        cos = (d32 * d16).sum(-1) / (
            np.linalg.norm(d32, axis=-1) * np.linalg.norm(d16, axis=-1)
        )
        assert cos.min() > 0.999, cos

        if model_type == "patch_aug_net":
            # geometry invariance: index selection never sees bf16
            for a, b in zip(o32.center_idx_origin, o16.center_idx_origin):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(o32.sample_idx_origin, o16.sample_idx_origin):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            for f in o16.fp_features:
                assert f.dtype == jnp.float32

    def test_f32_default_unchanged(self, rng):
        """No COMPUTE_DTYPE key -> byte-identical to the pre-flag path."""
        x = jnp.asarray(rng.rand(2, 256, 3), jnp.float32)
        m = get_model("patch_aug_net", PATCH_AUG_PARAM)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        m_none = get_model("patch_aug_net", dict(PATCH_AUG_PARAM, COMPUTE_DTYPE=None))
        a = jax.jit(lambda v, a: m.apply(v, a))(v, x)
        b = jax.jit(lambda v, a: m_none.apply(v, a))(v, x)
        np.testing.assert_array_equal(
            np.asarray(a.global_desc), np.asarray(b.global_desc)
        )
