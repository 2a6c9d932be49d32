"""End-to-end dataset creation from an on-disk Oxford-format tree.

Builds a miniature benchmark layout (trip dirs with
``{submap_type}.csv`` + float64 ``.bin`` submaps), registers it, runs
SceneDataset.create() for both splits, and drives tuple sampling +
descriptor extraction + recall through the real file-loading path
(including the native batch loader when available).
"""
import os

import numpy as np
import pytest

from patchaugnet_tpu import data
from patchaugnet_tpu.data.dataset_info import DatasetInfo, dataset_info_dict

N_POINTS = 64


@pytest.fixture
def disk_dataset(tmp_path, monkeypatch, rng):
    monkeypatch.setenv(data.DATA_ROOT_ENV, str(tmp_path))
    info = DatasetInfo(
        name="minioxford",
        rel_dir="minioxford",
        train_submap_type="pointcloud_20m_10overlap",
        test_submap_type="pointcloud_20m_10overlap",
        cloud_ext=".bin",
        test_region_vertices=[[1000.0, 0.0]],
        test_region_width=100.0,
        train_radius_pos=10.0, train_radius_neg=50.0,
        test_radius_pos=25.0, test_radius_neg=50.0,
        num_points=N_POINTS,
    )
    dataset_info_dict["minioxford"] = info
    # 2 trips x 16 submaps: 10 in the train region (northing ~0..120),
    # 6 in the test region (northing ~1000)
    base_clouds = {}
    for t in range(2):
        trip = tmp_path / "minioxford" / f"trip{t}"
        sub = trip / info.train_submap_type
        sub.mkdir(parents=True)
        rows = ["timestamp,northing,easting"]
        for i in range(16):
            ts = 1000000 + t * 100 + i
            if i < 10:
                northing = i * 12.0 + rng.randn() * 0.5
            else:
                northing = 1000.0 + (i - 10) * 12.0 + rng.randn() * 0.5
            easting = rng.randn() * 0.5
            rows.append(f"{ts},{northing},{easting}")
            key = i  # same location index -> same geometry across trips
            if key not in base_clouds:
                base_clouds[key] = rng.rand(N_POINTS, 3) * 2 - 1
            cloud = base_clouds[key] + rng.randn(N_POINTS, 3) * 0.01
            cloud.astype(np.float64).tofile(str(sub / f"{ts}.bin"))
        (trip / (info.train_submap_type + ".csv")).write_text("\n".join(rows))
    yield info
    dataset_info_dict.pop("minioxford", None)


class TestDiskDatasetCreation:
    def test_create_train_split(self, disk_dataset):
        ds = data.SceneDataset("minioxford", for_training=True)
        ds.create()
        assert ds.trip_names == ["trip0", "trip1"]
        assert len(ds.records) == 20            # 10 per trip outside region
        t = ds.get_tuple(0, -1, False)
        assert t.positive_indices and t.negative_indices
        # pickles written
        assert os.path.exists(
            os.path.join(ds.pickle_dir(), f"{ds.dataset_type}_records.pickle")
        )

    def test_create_test_split_and_reload(self, disk_dataset):
        ds = data.SceneDataset("minioxford", for_training=False)
        ds.create()
        # reference semantics: test split keeps ALL records (the region
        # filter applies to train records only, scene_dataset.py:330-338);
        # only in-region queries get tuples (the XOR check, :363-365)
        assert len(ds.records) == 32
        tupled = [
            q for q in range(len(ds.records))
            if ds.get_tuple(q, -1, True).positive_indices
        ]
        assert len(tupled) == 12                # 6 per trip inside region
        for q in tupled:
            assert ds.records.iloc[q]["northing"] > 900
        ds2 = data.SceneDataset("minioxford", for_training=False)
        assert ds2.load()
        assert len(ds2.records) == 32
        assert ds2.get_tuple(tupled[0], -1, True).positive_indices

    def test_file_loading_and_recall(self, disk_dataset):
        ds = data.SceneDataset("minioxford", for_training=False)
        ds.create()
        clouds, _ = ds.get_clouds(list(range(4)))
        assert clouds.shape == (4, N_POINTS, 3)
        assert np.abs(clouds).max() > 0          # really read from disk

        def fake_forward(c):
            return c.mean(axis=1)

        ds.make_descs(fake_forward, batch_size=5)
        results = ds.recall_precision_all(top_k=3)
        assert len(results) == 2
        for res in results.values():
            assert res.num_evaluated > 0
            assert res.recall[-1] > 50.0         # same-geometry cross-trip pairs

    def test_tuple_dataset_end_to_end(self, disk_dataset):
        data.SceneDataset("minioxford", for_training=True).create()
        # locations are ~12 m apart with radius_pos=10: each query's only
        # positive is the same-location submap of the other trip
        pr = data.PlaceRecognitionDataset("minioxford", True, num_pos=1, num_neg=4)
        batch = pr.sample_batch([0, 1])
        assert batch is not None
        assert batch.clouds.shape == (14, N_POINTS, 3)  # 2 x (1+1+4+1)
