"""Numerical parity: reference torch PointNetVlad -> flax via the
checkpoint importer.

Loads the reference's torch-only model (PointNetVlad.py — no CUDA
extension deps), saves its state dict, imports it with
compat.load_torch_checkpoint, and compares descriptors on identical
inputs in eval mode. This is the strongest cross-framework correctness
check available without GPU hardware.
"""
import importlib.util
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference/place_recognition/pointnet_vlad/PointNetVlad.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference tree not mounted"
)


def _load_reference_module():
    spec = importlib.util.spec_from_file_location("ref_pointnetvlad", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def torch_model_and_ckpt(tmp_path_factory):
    import torch

    torch.manual_seed(0)
    mod = _load_reference_module()
    model = mod.PointNetVlad(
        num_points=256, global_feat=True, feature_transform=True,
        max_pool=False, output_dim=256,
    )
    model.eval()
    path = tmp_path_factory.mktemp("ckpt") / "ref.pth"
    torch.save({"state_dict_encoder": model.state_dict()}, str(path))
    return model, str(path)


class TestPointNetVladParity:
    def test_descriptor_parity(self, torch_model_and_ckpt, rng):
        import torch

        torch_model, ckpt = torch_model_and_ckpt
        from patchaugnet_tpu.compat import load_torch_checkpoint
        from patchaugnet_tpu.models import get_model

        cfg = {"NUM_POINTS": 256, "FEATURE_OUTPUT_DIM": 256}
        model = get_model("pointnet_vlad", cfg)
        x_np = rng.rand(3, 256, 3).astype(np.float32)
        template = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
        variables = load_torch_checkpoint(ckpt, "pointnet_vlad", cfg, template)

        with torch.no_grad():
            ref = torch_model(torch.from_numpy(x_np).unsqueeze(1)).numpy()
        got = np.asarray(model.apply(variables, jnp.asarray(x_np), train=False))
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)

    def test_bare_state_dict_accepted(self, torch_model_and_ckpt, tmp_path):
        import torch

        torch_model, _ = torch_model_and_ckpt
        bare = tmp_path / "bare.pth"
        torch.save(torch_model.state_dict(), str(bare))
        from patchaugnet_tpu.compat import load_torch_checkpoint

        variables = load_torch_checkpoint(str(bare), "pointnet_vlad", {})
        assert "params" in variables and "batch_stats" in variables


class TestConverterCompleteness:
    def test_pointnet_vlad_consumes_every_key(self, torch_model_and_ckpt):
        """VERDICT round 1 item 6: every reference state-dict key must be
        consumed (no silently-dropped weights)."""
        torch_model, _ = torch_model_and_ckpt
        from patchaugnet_tpu.compat.torch_loader import convert_pointnet_vlad

        sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
        _, unused = convert_pointnet_vlad(sd)
        leftovers = [u for u in unused if "num_batches_tracked" not in u]
        assert not leftovers, leftovers[:10]

    def test_all_eval_model_types_have_converters(self):
        """Every model type the eval CLI accepts imports reference
        checkpoints (reference evaluate.py:150-158 accepts all four)."""
        from patchaugnet_tpu.compat.torch_loader import _CONVERTERS

        for model_type in ("pointnet_vlad", "pptnet", "pptnet_l2_norm",
                           "patch_aug_net", "minkloc3dv2"):
            assert model_type in _CONVERTERS, model_type
