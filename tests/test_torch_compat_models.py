"""Torch-weight import for PPT-Net / PatchAugNet.

The reference backbones need the CUDA pointops extension to *run*, but
constructing them (and their state dicts) only needs torch — so these
tests stub the extension import, convert real reference state dicts,
check tree/shape agreement against the flax templates, and verify
numerical parity on the submodules that run on CPU torch (the SPVLAD
aggregation heads, the grouped self-attention layer, and the patch
decoder — everything outside the CUDA ops).
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference tree not mounted"
)


def _load_ref_model(model_dir: str, model_file: str):
    sys.modules.setdefault("pointops_cuda", types.ModuleType("pointops_cuda"))
    if REF not in sys.path:
        sys.path.insert(0, REF)
    mdir = os.path.join(REF, "place_recognition", model_dir, "models")
    sys.path.insert(0, mdir)
    # both model dirs define a module named "loupe" — evict cached copies
    for name in ("loupe", "pt_util", "pointnet_autoencoder"):
        sys.modules.pop(name, None)
    spec = importlib.util.spec_from_file_location(
        f"ref_{model_dir}", os.path.join(mdir, model_file)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sys.path.remove(mdir)
    return mod


def _tree_shapes_match(template, converted):
    ok = True
    msgs = []

    def walk(path, a, b):
        nonlocal ok
        if isinstance(a, dict):
            for k in a:
                if k not in b:
                    ok = False
                    msgs.append(f"missing {path}/{k}")
                else:
                    walk(f"{path}/{k}", a[k], b[k])
            for k in b:
                if k not in a:
                    ok = False
                    msgs.append(f"extra {path}/{k}")
        else:
            if tuple(np.shape(a)) != tuple(np.shape(b)):
                ok = False
                msgs.append(f"shape {path}: {np.shape(a)} vs {np.shape(b)}")

    walk("", dict(template), dict(converted))
    return ok, msgs


class TestPatchAugNetImport:
    @pytest.fixture(scope="class")
    def ref_and_converted(self):
        import yaml

        cfg = yaml.safe_load(open(os.path.join(REF, "configs/patch_aug_net.yaml")))
        mod = _load_ref_model("patch_aug_net", "patch_aug_net.py")
        import torch

        torch.manual_seed(0)
        net = mod.Network(param=cfg, use_a2a_recon=True, use_l2_norm=True)
        net.eval()
        sd = {k: v.numpy() for k, v in net.state_dict().items()}
        from patchaugnet_tpu.compat.torch_loader import convert_patch_aug_net

        variables, unused = convert_patch_aug_net(sd)
        return cfg, net, variables, unused

    def test_tree_and_shapes(self, ref_and_converted):
        cfg, net, variables, unused = ref_and_converted
        from patchaugnet_tpu.models import get_model

        model = get_model("patch_aug_net", cfg)
        x = jnp.zeros((2, 64, 3))
        template = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), x, with_patches=True)
        )
        ok, msgs = _tree_shapes_match(template["params"], variables["params"])
        assert ok, msgs[:10]
        # only dead submodules may remain unconsumed
        allowed = ("hidden1_weights", "bn2", "context_gating", "trans_conv",
                   "after_norm", "num_batches_tracked")
        leftovers = [u for u in unused if not any(a in u for a in allowed)]
        assert not leftovers, leftovers[:10]

    def test_aggregation_numerical_parity(self, ref_and_converted, rng):
        import torch

        cfg, net, variables, _ = ref_and_converted
        from patchaugnet_tpu.nn import SpatialPyramidNetVLAD

        feats = [
            rng.randn(2, 128, 256).astype(np.float32),
            rng.randn(2, 1024, 256).astype(np.float32),
            rng.randn(2, 4096, 256).astype(np.float32),
        ]
        with torch.no_grad():
            ref_out = net.aggregation(
                [torch.from_numpy(f).permute(0, 2, 1).unsqueeze(-1) for f in feats]
            ).numpy()
        agg = SpatialPyramidNetVLAD(
            feature_size=cfg["FEATURE_SIZE"],
            max_samples=cfg["MAX_SAMPLES"],
            cluster_size=cfg["CLUSTER_SIZE"],
            output_dim=cfg["OUTPUT_DIM"],
            gating=cfg["GATING"],
            aggregation_type=cfg["AGGREGATION_TYPE"],
        )
        sub_vars = {
            "params": variables["params"]["aggregation"],
            "batch_stats": variables["batch_stats"]["aggregation"],
        }
        got = np.asarray(agg.apply(sub_vars, [jnp.asarray(f) for f in feats]))
        np.testing.assert_allclose(got, ref_out, atol=2e-4, rtol=1e-3)

    def test_decoder_numerical_parity(self, ref_and_converted, rng):
        import torch

        cfg, net, variables, _ = ref_and_converted
        from patchaugnet_tpu.nn import PointNetDecoder

        z = rng.randn(8, 256).astype(np.float32)
        with torch.no_grad():
            ref_out = net.decoder(torch.from_numpy(z)).numpy()
        dec = PointNetDecoder(embedding_size=256, num_points=cfg["KNN"][0])
        sub_vars = {
            "params": variables["params"]["decoder"],
            "batch_stats": variables["batch_stats"]["decoder"],
        }
        got = np.asarray(dec.apply(sub_vars, jnp.asarray(z)))
        np.testing.assert_allclose(got, ref_out, atol=2e-4, rtol=1e-3)


class TestPPTNetImport:
    @pytest.fixture(scope="class")
    def ref_and_converted(self):
        import yaml

        cfg = yaml.safe_load(open(os.path.join(REF, "configs/pptnet_origin.yaml")))
        mod = _load_ref_model("pptnet_origin", "pptnet.py")
        import torch

        torch.manual_seed(0)
        net = mod.Network(param=cfg, use_normalize=False)
        net.eval()
        sd = {k: v.numpy() for k, v in net.state_dict().items()}
        from patchaugnet_tpu.compat.torch_loader import convert_pptnet

        variables, unused = convert_pptnet(sd, gp=cfg["GROUP"])
        return cfg, net, mod, variables, unused

    def test_tree_and_shapes(self, ref_and_converted):
        cfg, net, mod, variables, unused = ref_and_converted
        from patchaugnet_tpu.models import get_model

        model = get_model("pptnet", cfg)
        x = jnp.zeros((2, 64, 3))
        template = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
        ok, msgs = _tree_shapes_match(template["params"], variables["params"])
        assert ok, msgs[:10]
        allowed = ("hidden1_weights", "bn2", "context_gating", "num_batches_tracked")
        leftovers = [u for u in unused if not any(a in u for a in allowed)]
        assert not leftovers, leftovers[:10]

    def test_aggregation_numerical_parity(self, ref_and_converted, rng):
        import torch

        cfg, net, mod, variables, _ = ref_and_converted
        from patchaugnet_tpu.nn import PPTSpatialPyramidNetVLAD

        sizes = cfg["MAX_SAMPLES"]
        feats = [rng.randn(2, s, 256).astype(np.float32) for s in sizes]
        with torch.no_grad():
            ref_out = net.aggregation(
                *[torch.from_numpy(f).permute(0, 2, 1).unsqueeze(-1) for f in feats]
            ).numpy()
        agg = PPTSpatialPyramidNetVLAD(
            feature_size=cfg["FEATURE_SIZE"],
            max_samples=sizes,
            cluster_size=cfg["CLUSTER_SIZE"],
            output_dim=cfg["OUTPUT_DIM"],
            gating=cfg["GATING"],
        )
        sub_vars = {
            "params": variables["params"]["aggregation"],
            "batch_stats": variables["batch_stats"]["aggregation"],
        }
        got = np.asarray(agg.apply(sub_vars, [jnp.asarray(f) for f in feats]))
        np.testing.assert_allclose(got, ref_out, atol=2e-4, rtol=1e-3)

    def test_group_sa_numerical_parity(self, ref_and_converted, rng):
        import torch

        cfg, net, mod, variables, _ = ref_and_converted
        from patchaugnet_tpu.nn import GroupSA

        x = rng.randn(2, 64, 64).astype(np.float32)        # (B, N, C=64) level 0
        ref_layer = net.backbone.SA_modules[0].sas[0]
        with torch.no_grad():
            ref_out = (
                ref_layer(torch.from_numpy(x).permute(0, 2, 1))
                .permute(0, 2, 1)
                .numpy()
            )
        sa = GroupSA(64, cfg["GROUP"])
        sub_vars = {
            "params": variables["params"]["sa0"]["sa"],
            "batch_stats": variables["batch_stats"]["sa0"]["sa"],
        }
        got = np.asarray(sa.apply(sub_vars, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref_out, atol=2e-4, rtol=1e-3)


class TestMinkLocImport:
    """Converter completeness for minkloc3dv2 (VERDICT round 1 item 6).

    MinkowskiEngine is not installable here, so the reference module
    cannot be constructed; instead the ME state dict is built
    programmatically from the MinkFPN architecture rules
    (minkfpn.py:31-62, resnet.py:73-87, eca_block.py:11-18) — exact
    names and shapes — and the converter must consume every key and
    fill every flax leaf."""

    PARAM = {
        "feature_size": 256, "output_dim": 256,
        "planes": [64, 128, 64, 32], "layers": [1, 1, 1, 1],
        "num_top_down": 2, "conv0_kernel_size": 5,
        "block": "ECABasicBlock", "pooling": "GeM",
        "coordinates": "cartesian", "grid_size": 32,
    }

    @staticmethod
    def _eca_k(channels):
        t = int(abs((np.log2(channels) + 1) / 2))
        return t if t % 2 else t + 1

    def _me_state_dict(self, p):
        """ME-style state dict with every value distinct."""
        rng = np.random.RandomState(0)
        sd = {}

        def add(key, shape):
            # small magnitudes: random conv chains otherwise overflow
            # through GeM's power-3 pooling
            sd[key] = (rng.randn(*shape) * 0.05).astype(np.float32)

        def add_bn(prefix, c):
            for nm, shape in [("weight", (c,)), ("bias", (c,)),
                              ("running_mean", (c,))]:
                add(f"{prefix}.bn.{nm}", shape)
            sd[f"{prefix}.bn.running_var"] = (
                rng.rand(c).astype(np.float32) + 0.5
            )
            sd[f"{prefix}.bn.num_batches_tracked"] = np.asarray(0)

        planes, layers = p["planes"], p["layers"]
        k0 = p["conv0_kernel_size"]
        add("backbone.conv0.kernel", (k0 ** 3, 1, planes[0]))
        add_bn("backbone.bn0", planes[0])
        in_ch = planes[0]
        for i in range(len(layers)):
            add(f"backbone.convs.{i}.kernel", (8, in_ch, in_ch))
            add_bn(f"backbone.bn.{i}", in_ch)
            for j in range(layers[i]):
                pref = f"backbone.blocks.{i}.{j}"
                add(f"{pref}.conv1.kernel", (27, in_ch, planes[i]))
                add_bn(f"{pref}.norm1", planes[i])
                add(f"{pref}.conv2.kernel", (27, planes[i], planes[i]))
                add_bn(f"{pref}.norm2", planes[i])
                add(f"{pref}.eca.conv.weight", (1, 1, self._eca_k(planes[i])))
                if in_ch != planes[i]:
                    add(f"{pref}.downsample.0.kernel", (in_ch, planes[i]))
                    add_bn(f"{pref}.downsample.1", planes[i])
                in_ch = planes[i]
        lat = p["feature_size"]
        add("backbone.conv1x1.0.kernel", (planes[-1], lat))
        for i in range(p["num_top_down"]):
            add(f"backbone.tconvs.{i}.kernel", (8, lat, lat))
            add(f"backbone.conv1x1.{i + 1}.kernel", (planes[-2 - i], lat))
        sd["pooling.pooling.p"] = np.asarray([3.0], np.float32)
        return sd

    def test_tree_shapes_and_full_consumption(self):
        from patchaugnet_tpu.compat.torch_loader import convert_minkloc3dv2
        from patchaugnet_tpu.models.minkloc3dv2 import build_minkloc

        p = self.PARAM
        sd = self._me_state_dict(p)
        variables, unused = convert_minkloc3dv2(
            sd, planes=tuple(p["planes"]), layers=tuple(p["layers"]),
            num_top_down=p["num_top_down"],
            conv0_kernel_size=p["conv0_kernel_size"],
            block=p["block"], pooling=p["pooling"],
        )
        # every torch key consumed (BN step counters are meaningless here)
        leftovers = [u for u in unused if "num_batches_tracked" not in u]
        assert not leftovers, leftovers[:10]
        # every flax leaf filled with the right shape
        model = build_minkloc(p)
        x = jnp.zeros((1, 32, 3))
        template = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
        for coll in ("params", "batch_stats"):
            ok, msgs = _tree_shapes_match(template[coll], variables[coll])
            assert ok, (coll, msgs[:10])
        # converted weights drive a working forward
        out = model.apply(variables, jnp.asarray(
            np.random.RandomState(0).rand(2, 64, 3).astype(np.float32) * 2 - 1
        ))
        assert out.shape == (2, 256) and bool(jnp.isfinite(out).all())

    def test_kernel_offset_mapping(self):
        """ME linear kernel index l = x + K*y + K^2*z must land at flax
        kernel[x, y, z] (x-fastest hypercube iteration)."""
        from patchaugnet_tpu.compat.torch_loader import _t_me_kernel

        K = 3
        w = np.arange(K ** 3, dtype=np.float32).reshape(K ** 3, 1, 1)
        f = _t_me_kernel(w, K)
        assert f.shape == (K, K, K, 1, 1)
        for z in range(K):
            for y in range(K):
                for x in range(K):
                    assert f[x, y, z, 0, 0] == x + K * y + K * K * z

    def test_load_torch_checkpoint_wiring(self, tmp_path):
        import torch

        from patchaugnet_tpu.compat import load_torch_checkpoint

        sd = self._me_state_dict(self.PARAM)
        path = tmp_path / "minkloc.pth"
        torch.save(
            {"state_dict_encoder": {k: torch.from_numpy(np.atleast_1d(v))
                                    for k, v in sd.items()}}, str(path)
        )
        variables = load_torch_checkpoint(
            str(path), "minkloc3dv2", self.PARAM, template_variables=None
        )
        assert "backbone" in variables["params"]
        assert "pooling" in variables["params"]
