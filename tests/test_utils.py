"""Tests for utils: geometry, profiling, visualization."""
import os
import numpy as np

from patchaugnet_tpu import utils
from patchaugnet_tpu.utils import visualization as viz


class TestGeometry:
    def test_iou_2d(self):
        assert utils.iou_2d([0, 0, 2, 2], [1, 1, 3, 3]) == 1 / 7
        assert utils.iou_2d([0, 0, 1, 1], [2, 2, 3, 3]) == 0.0
        assert utils.iou_2d([0, 0, 2, 2], [0, 0, 2, 2]) == 1.0

    def test_iou_3d(self):
        assert utils.iou_3d([0, 0, 0, 2, 2, 2], [0, 0, 0, 2, 2, 2]) == 1.0
        assert utils.iou_3d([0, 0, 0, 1, 1, 1], [5, 5, 5, 6, 6, 6]) == 0.0

    def test_overlap_ratio_identical(self, rng):
        pc = rng.rand(500, 3) * 10
        assert utils.compute_overlap_ratio(pc, pc.copy()) == 1.0

    def test_overlap_ratio_disjoint(self, rng):
        pc1 = rng.rand(100, 3) * 5
        pc2 = rng.rand(100, 3) * 5 + 100
        assert utils.compute_overlap_ratio(pc1, pc2) == 0.0

    def test_overlap_partial(self, rng):
        pc1 = rng.rand(500, 3) * 10
        pc2 = pc1 + np.array([5.0, 0, 0])
        r = utils.compute_overlap_ratio(pc1, pc2)
        assert 0.0 < r < 1.0

    def test_get_overlap_indices(self, rng):
        pc1 = rng.rand(50, 3)
        pc2 = np.concatenate([pc1[:20] + 0.001, rng.rand(30, 3) + 10])
        i1, i2 = utils.get_overlap_indices(pc1, pc2, max_dist=0.1)
        assert set(range(20)) <= i1
        assert set(range(20)) <= i2
        assert not any(i >= 20 for i in i2)

    def test_rre_rte(self):
        r = utils.rotation_matrix_z(np.pi / 6)
        assert abs(utils.relative_rotation_error(np.eye(3), r) - 30.0) < 1e-4
        assert utils.relative_translation_error([0, 0, 0], [3, 4, 0]) == 5.0


class TestProfiling:
    def test_flops_matmul(self):
        import jax.numpy as jnp

        f = utils.flops(lambda a, b: a @ b, jnp.ones((64, 64)), jnp.ones((64, 64)))
        if f is not None and not np.isnan(f):
            assert f >= 2 * 64 ** 3 * 0.9

    def test_parameter_count(self):
        params = {"layer1": {"w": np.zeros((3, 4))}, "layer2": {"w": np.zeros(5)}}
        pc = utils.parameter_count(params)
        assert pc["layer1"] == 12 and pc["layer2"] == 5 and pc["TOTAL"] == 17

    def test_device_timer(self):
        import jax.numpy as jnp

        t = utils.DeviceTimer()
        t.timed_call(lambda x: x * 2, jnp.ones((8, 8)))
        t.timed_call(lambda x: x * 2, jnp.ones((8, 8)))
        s = t.stats()
        assert s["mean_ms"] > 0 and s["n"] == 1


class TestVisualization:
    def test_recall_curves(self, tmp_path):
        path = viz.plot_recall_curves(
            {"ours": np.linspace(80, 99, 25), "ref": np.linspace(75, 97, 25)},
            str(tmp_path / "recall.png"),
        )
        assert os.path.exists(path) and os.path.getsize(path) > 1000

    def test_tsne(self, tmp_path, rng):
        feats = rng.rand(60, 16)
        labels = np.repeat(np.arange(6), 10)
        path = viz.plot_tsne_features(feats, labels, str(tmp_path / "tsne.png"))
        assert os.path.exists(path)

    def test_clouds(self, tmp_path, rng):
        path = viz.plot_clouds(
            [rng.rand(100, 3), rng.rand(100, 3)], str(tmp_path / "clouds.png"),
            labels=["origin", "recon"],
        )
        assert os.path.exists(path)

    def test_pose_cmp(self, rng):
        a = rng.rand(10, 2)
        b = rng.rand(10, 2)
        out = viz.compare_pose_errors(a, b, ("m1", "m2"))
        assert "rre_mean" in out["m1"] and out["m2"]["n"] == 10


class TestGeometryExtras:
    def test_nn_dist(self, rng):
        c = rng.rand(10, 3)
        d = utils.geometry.nn_dist(c) if hasattr(utils, "geometry") else None
        from patchaugnet_tpu.utils.geometry import nn_dist

        d = nn_dist(c)
        assert d.shape == (10, 10)
        np.testing.assert_allclose(np.diag(d), 0, atol=1e-9)
        np.testing.assert_allclose(d[1, 2], np.linalg.norm(c[1] - c[2]))

    def test_voxel_downsample(self, rng):
        from patchaugnet_tpu.utils.geometry import voxel_downsample

        pts = rng.rand(500, 3).astype(np.float32)
        out = voxel_downsample(pts, 0.25)
        assert 0 < len(out) <= 4 ** 3 + 30
        # averaging keeps points within their voxel
        assert np.isfinite(out).all()

    def test_icp_recovers_transform(self, rng):
        from patchaugnet_tpu.utils.geometry import icp_point_to_point
        from patchaugnet_tpu.utils import rotation_matrix_z

        src = rng.rand(300, 3) * 5
        r = rotation_matrix_z(0.1)
        t = np.array([0.2, -0.1, 0.05])
        tgt = src @ r.T + t
        T, err = icp_point_to_point(src, tgt, max_iterations=100)
        np.testing.assert_allclose(T[:3, :3], r, atol=1e-3)
        np.testing.assert_allclose(T[:3, 3], t, atol=1e-3)
        assert err < 1e-3

    def test_nn_angle_shape(self, rng):
        from patchaugnet_tpu.utils.geometry import nn_angle

        c = rng.rand(12, 3).astype(np.float32)
        a = nn_angle(c, k=3)
        assert a.shape == (1, 3, 12, 12)
        assert np.abs(a).max() <= 1.0 + 1e-5
