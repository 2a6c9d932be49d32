"""Full user pipeline on file-backed Oxford-format data, through the
three CLIs a reference user would run:

  create_dataset.py -> train.py -> evaluate.py

with the dataset registered via PCR_EXTRA_DATASETS (no code edits) —
the strongest "switch from the reference" demonstration available
without the real benchmark data. Also exercises the round-2
descriptor store + top-k dump on a real directory tree.
"""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_POINTS = 64


def _build_tree(root, rng):
    """2 trips x 16 submaps (10 train-region, 6 test-region), shared
    per-location geometry so cross-trip retrieval is learnable."""
    base = {}
    for t in range(2):
        sub = root / "minioxford" / f"trip{t}" / "pointcloud_20m_10overlap"
        sub.mkdir(parents=True)
        rows = ["timestamp,northing,easting"]
        for i in range(16):
            ts = 1000000 + t * 100 + i
            northing = (
                i * 12.0 if i < 10 else 1000.0 + (i - 10) * 12.0
            ) + rng.randn() * 0.5
            rows.append(f"{ts},{northing},{rng.randn() * 0.5}")
            if i not in base:
                base[i] = rng.rand(N_POINTS, 3) * 2 - 1
            cloud = base[i] + rng.randn(N_POINTS, 3) * 0.01
            cloud.astype(np.float64).tofile(str(sub / f"{ts}.bin"))
        (sub.parent / "pointcloud_20m_10overlap.csv").write_text("\n".join(rows))


def _env(tmp_path):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PCR_DATA_ROOT"] = str(tmp_path)
    env["PCR_EXTRA_DATASETS"] = str(tmp_path / "datasets.yaml")
    return env


def _run(args, env, timeout=900):
    proc = subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, (args[0], proc.stderr[-4000:])
    return proc


@pytest.mark.slow
def test_create_train_evaluate_pipeline(tmp_path):
    rng = np.random.RandomState(0)
    _build_tree(tmp_path, rng)

    # dataset registration is one YAML entry, not a code edit
    with open(tmp_path / "datasets.yaml", "w") as f:
        yaml.safe_dump(
            [{
                "name": "minioxford", "rel_dir": "minioxford",
                "train_submap_type": "pointcloud_20m_10overlap",
                "test_submap_type": "pointcloud_20m_10overlap",
                "cloud_ext": ".bin", "cloud_dtype": "float64",
                "test_region_vertices": [[1000.0, 0.0]],
                "test_region_width": 100.0,
                "train_radius_pos": 13.0, "train_radius_neg": 50.0,
                "test_radius_pos": 13.0, "test_radius_neg": 50.0,
                "num_points": N_POINTS,
            }],
            f,
        )
    env = _env(tmp_path)

    # 1. dataset creation (reference place_recognition_dataset __main__)
    proc = _run(["create_dataset.py", "--datasets", "minioxford"], env)
    assert "records: " in proc.stdout
    pickles = os.listdir(tmp_path / "minioxford" / "pickle_data")
    assert any("train_" in p for p in pickles)
    assert any("test_" in p for p in pickles)

    # 2. training (tiny flagship config scaled to the 64-pt clouds)
    cfg = yaml.safe_load(open(os.path.join(REPO, "configs/tiny_smoke.yaml")))
    cfg.update(NUM_POINTS=N_POINTS, TRAIN_POSITIVES_PER_QUERY=1,
               TRAIN_NEGATIVES_PER_QUERY=2)
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    exp = str(tmp_path / "exp")
    _run(
        ["train.py", "--config", cfg_path, "--dataset", "minioxford",
         "--platform", "cpu", "--devices", "1", "--epochs", "1",
         "--max-batches", "3", "--exp_dir", exp],
        env,
    )
    ckpt = os.path.join(exp, "patch_aug_net", "saved_model", "train_epoch_0_end")
    assert os.path.exists(ckpt)

    # 3. evaluation with the trained weights: recall + descriptor store
    #    + top-k dump land in the reference layout
    proc = _run(
        ["evaluate.py", "--model_type", "patch_aug_net", "--config", cfg_path,
         "--dataset", "minioxford", "--weight", ckpt, "--batch_size", "8",
         "--platform", "cpu", "--exp_dir", exp, "--top_k", "5"],
        env,
    )
    logs = proc.stdout + proc.stderr
    assert "Average Recall @1" in logs
    store = tmp_path / "minioxford" / "pickle_data" / "desc_patch_aug_net_test"
    g_files = os.listdir(store / "global")
    l_files = os.listdir(store / "local")
    assert len(g_files) == 32 and len(l_files) == 32
    with open(store / "global" / "0.pickle", "rb") as f:
        g0 = pickle.load(f)
    assert g0.shape == (1, cfg["FEATURE_OUTPUT_DIM"])
    with open(store / "local" / "0.pickle", "rb") as f:
        l_pos, l_desc, norm_meta = pickle.load(f)
    assert l_pos.shape == (cfg["SAMPLING"][0], 3)
    # top-k dump pickles in the reference names (test mode: per pair)
    dump = [p for p in os.listdir(store) if p.startswith("top_k_index_test_")]
    assert len(dump) == 2  # (0,1) and (1,0)

    # 4. mesh-sharded eval CLI: same weights, descriptor extraction —
    #    including the local-descriptor store — sharded over the
    #    8-device virtual mesh. The store must hold the same values as
    #    the --devices 1 run above (round-3: the sharded path no longer
    #    drops the store).
    def _store_snapshot():
        snap = {}
        for sub in ("global", "local"):
            for fn in os.listdir(store / sub):
                with open(store / sub / fn, "rb") as f:
                    snap[f"{sub}/{fn}"] = pickle.load(f)
        return snap

    single = _store_snapshot()
    for sub in ("global", "local"):
        for fn in os.listdir(store / sub):
            os.unlink(store / sub / fn)
    proc = _run(
        ["evaluate.py", "--model_type", "patch_aug_net", "--config", cfg_path,
         "--dataset", "minioxford", "--weight", ckpt, "--batch_size", "8",
         "--platform", "cpu", "--devices", "8", "--exp_dir", exp,
         "--no_save_top_k"],
        env,
    )
    logs8 = proc.stdout + proc.stderr
    assert "Average Recall @1" in logs8
    sharded = _store_snapshot()
    assert set(sharded) == set(single)
    for key, val in single.items():
        got = sharded[key]
        if isinstance(val, tuple):           # local: (kpt, desc, norm_meta)
            np.testing.assert_allclose(got[0], val[0], atol=1e-5)
            np.testing.assert_allclose(got[1], val[1], atol=1e-5)
        else:
            np.testing.assert_allclose(got, val, atol=1e-5)
