"""AOT serving-export tests: the StableHLO artifact must reproduce the
live eval forward to float-roundoff (the weights bake in as StableHLO
constants, which licenses different fusions than the live program —
observed diffs are ~1e-7 on unit-norm descriptors) and the CLI must produce loadable artifacts end-to-end.

The reference has no serving story at all — deployment means carrying
the training repo + compiled CUDA extensions to the serving host
(/root/reference/place_recognition/evaluate.py:167-186). This is the
TPU-native replacement, so the tests define its contract from scratch.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from patchaugnet_tpu import serving, train
from patchaugnet_tpu.models import get_model
from patchaugnet_tpu.train.step import _global_desc

from test_train import SMALL_CFG

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PNV_PARAM = {"NUM_POINTS": 256, "FEATURE_OUTPUT_DIM": 256}


def _small_state():
    model = get_model("patch_aug_net", SMALL_CFG)
    x = jnp.zeros((2, SMALL_CFG["NUM_POINTS"], 3))
    state = train.create_train_state(
        model, jax.random.PRNGKey(0), x, SMALL_CFG,
        init_kwargs={"with_patches": True},
    )
    return model, state.variables


class TestExportRoundtrip:
    def test_global_artifact_matches_live_forward(self, rng, tmp_path):
        model, variables = _small_state()
        clouds = jnp.asarray(rng.rand(2, 128, 3), jnp.float32)

        exported = serving.export_descriptor_fn(model, variables, 2, 128)
        path = str(tmp_path / "pan_desc_b2.shlo")
        serving.save_artifact(exported, path, {"model_type": "patch_aug_net"})
        fwd, meta = serving.load_artifact(path)

        got = np.asarray(fwd(clouds))
        want = np.asarray(
            _global_desc(model.apply(variables, clouds, train=False))
        )
        np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)
        assert meta["format"] == "patchaugnet-tpu-serving/1"
        assert meta["model_type"] == "patch_aug_net"
        assert meta["bytes"] == os.path.getsize(path)
        assert "cpu" in meta["export_platforms"]

    def test_local_artifact_matches_live_forward(self, rng, tmp_path):
        model, variables = _small_state()
        clouds = jnp.asarray(rng.rand(2, 128, 3), jnp.float32)

        exported = serving.export_descriptor_fn(
            model, variables, 2, 128, with_local=True
        )
        path = str(tmp_path / "pan_local_b2.shlo")
        serving.save_artifact(exported, path)
        fwd, _ = serving.load_artifact(path)

        g, loc, ci = fwd(clouds)
        out = model.apply(variables, clouds, train=False)
        np.testing.assert_allclose(np.asarray(g),
                                   np.asarray(_global_desc(out)),
                                   atol=2e-6, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(loc),
                                   np.asarray(out.fp_features[-2]),
                                   atol=1e-4, rtol=1e-4)
        # index selection must stay EXACT: refusion can move float bits,
        # but integer index math has no roundoff to move
        np.testing.assert_array_equal(np.asarray(ci),
                                      np.asarray(out.center_idx_origin[0]))
        assert ci.dtype == jnp.int32

    def test_batch_size_is_baked_into_the_artifact(self, rng, tmp_path):
        model, variables = _small_state()
        exported = serving.export_descriptor_fn(model, variables, 2, 128)
        path = str(tmp_path / "pan_b2.shlo")
        serving.save_artifact(exported, path)
        fwd, _ = serving.load_artifact(path)
        bad = jnp.asarray(rng.rand(3, 128, 3), jnp.float32)
        # jax.export raises ValueError("Shape mismatch ...") for a
        # shape the artifact wasn't traced with (narrowed from bare
        # Exception per ADVICE r3 — an I/O or import error must not
        # satisfy this test)
        with pytest.raises((ValueError, TypeError), match="[Ss]hape"):
            fwd(bad)

    def test_local_export_rejects_models_without_locals(self):
        model = get_model("pointnet_vlad", PNV_PARAM)
        x = jnp.zeros((2, 256, 3))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        with pytest.raises(ValueError, match="no local descriptors"):
            serving.export_descriptor_fn(
                model, variables, 2, 256, with_local=True
            )

    def test_minkloc_sparse_export_roundtrip(self, rng, tmp_path):
        """The sparse voxel-table forward (sorts, rank merges, routed
        gather convs) survives StableHLO export/reload byte-for-run:
        a serving host replays the exact table machinery."""
        from patchaugnet_tpu.models.minkloc_sparse import MinkLocSparse

        model = MinkLocSparse(
            feature_size=32, output_dim=16, planes=(8, 8, 8, 8),
            num_top_down=2, conv0_kernel_size=5, quantization_step=0.05,
        )
        clouds = jnp.asarray(rng.rand(2, 128, 3) * 2 - 1, jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), clouds)
        exported = serving.export_descriptor_fn(model, variables, 2, 128)
        path = str(tmp_path / "mls.shlo")
        serving.save_artifact(exported, path, {"model_type": "minkloc3dv2"})
        fwd, meta = serving.load_artifact(path)
        assert meta["model_type"] == "minkloc3dv2"
        want = np.asarray(model.apply(variables, clouds, train=False))
        np.testing.assert_allclose(np.asarray(fwd(clouds)), want,
                                   atol=2e-6, rtol=1e-5)

    def test_missing_sidecar_yields_empty_meta(self, rng, tmp_path):
        model = get_model("pointnet_vlad", PNV_PARAM)
        clouds = jnp.asarray(rng.rand(2, 256, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), clouds)
        exported = serving.export_descriptor_fn(model, variables, 2, 256)
        path = str(tmp_path / "pnv.shlo")
        serving.save_artifact(exported, path)
        os.remove(path + ".json")
        fwd, meta = serving.load_artifact(path)
        assert meta == {}
        want = np.asarray(model.apply(variables, clouds, train=False))
        np.testing.assert_allclose(np.asarray(fwd(clouds)), want,
                                   atol=2e-6, rtol=1e-5)


class TestExportCLI:
    def test_cli_writes_loadable_artifacts(self, tmp_path):
        out = str(tmp_path / "serving")
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(
            [
                sys.executable, "export_serving.py",
                "--model_type", "patch_aug_net",
                "--config", os.path.join(REPO, "configs/tiny_smoke.yaml"),
                "--out", out, "--batch_sizes", "2", "--with_local",
                "--platform", "cpu",
            ],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
        )
        assert proc.returncode == 0, proc.stderr[-4000:]

        for tag, n_out in (("desc", 1), ("local", 3)):
            path = os.path.join(out, f"patch_aug_net_{tag}_b2.shlo")
            assert os.path.exists(path), proc.stdout
            meta = json.load(open(path + ".json"))
            assert meta["flavour"] == tag
            assert meta["batch_size"] == 2
            assert meta["n_points"] == 128
            fwd, _ = serving.load_artifact(path)
            got = fwd(jnp.zeros((2, 128, 3)))
            got = got if isinstance(got, tuple) else (got,)
            assert len(got) == n_out
            assert all(bool(jnp.isfinite(a).all()) for a in got)
