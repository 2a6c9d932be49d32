"""Per-host input feeding (parallel/host_data.py, SURVEY §5.8).

Multi-process execution cannot run in one test process; what CAN be
verified on the 8-device virtual mesh is the load-bearing layout
assumption: the rows :func:`host_batch_slice` assigns to a simulated
host are exactly the rows the NamedSharding places on that host's
devices. Plus a full-reference-config parallel train step at real
shapes (VERDICT r2 #7a).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from patchaugnet_tpu import parallel
from patchaugnet_tpu.parallel import host_data


class TestHostSlices:
    def test_slices_partition_the_batch(self):
        idx = list(range(64))
        seen = []
        for pi in range(4):
            part = host_data.host_record_indices(idx, pi, 4)
            assert len(part) == 16
            seen += part
        assert seen == idx                       # disjoint, ordered, complete

    def test_uneven_split_rejected(self):
        with pytest.raises(AssertionError):
            host_data.host_batch_slice(10, 0, 4)

    def test_slice_matches_device_shard_layout(self):
        """host h's slice == concat of the shards on its devices, for a
        simulated 4-host view of the 8-device mesh (2 devices/host)."""
        mesh = parallel.make_mesh(8)
        batch = np.arange(32 * 3, dtype=np.float32).reshape(32, 3)
        global_arr = host_data.make_global_batch(mesh, batch)
        dev_rows = {}
        for shard in global_arr.addressable_shards:
            rows = shard.index[0]
            dev_rows[shard.device.id] = (rows.start or 0, rows.stop)
        devs = [d.id for d in mesh.devices.ravel()]
        for pi in range(4):
            owned = devs[pi * 2:(pi + 1) * 2]
            starts = [dev_rows[d][0] for d in owned]
            stops = [dev_rows[d][1] for d in owned]
            sl = host_data.host_batch_slice(32, pi, 4)
            assert min(starts) == sl.start and max(stops) == sl.stop

    def test_single_process_assembly_equals_shard_batch(self):
        mesh = parallel.make_mesh(8)
        batch = np.random.RandomState(0).rand(16, 4).astype(np.float32)
        a = host_data.make_global_batch(mesh, batch)
        b = parallel.shard_batch(mesh, batch)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.sharding == b.sharding


@pytest.mark.slow
class TestFullConfigParallelStep:
    def test_reference_config_step_on_virtual_mesh(self):
        """ONE full-reference-config PatchAugNet train step (4096-pt
        clouds, 18-cloud tuple) executes on the 8-device mesh — the
        dryrun gate uses tiny shapes; this de-risks sharded BN +
        cross-shard patch gathers at real shapes (VERDICT r2 #7a)."""
        import yaml
        import os

        from patchaugnet_tpu import train
        from patchaugnet_tpu.losses import PatchCorrespondences
        from patchaugnet_tpu.models import get_model

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg = yaml.safe_load(open(os.path.join(repo, "configs/patch_aug_net.yaml")))
        cfg.update(
            TRAIN_BATCH_SIZE=4,
            A2B_MAX_ROWS=2048, A2B_MAX_PAIRS=16,
        )
        tuple_size = (
            1 + cfg["TRAIN_POSITIVES_PER_QUERY"]
            + cfg["TRAIN_NEGATIVES_PER_QUERY"] + 1
        )
        total = cfg["TRAIN_BATCH_SIZE"] * tuple_size       # 72 clouds
        n = cfg["NUM_POINTS"]                              # 4096
        rng = np.random.RandomState(0)
        clouds = rng.rand(total, n, 3).astype(np.float32)

        mesh = parallel.make_mesh(8)
        model = get_model("patch_aug_net", cfg)
        state = train.create_train_state(
            model, jax.random.PRNGKey(0), jnp.asarray(clouds[:2]), cfg,
            init_kwargs={"with_patches": True},
        )
        step = parallel.build_parallel_train_step(model, cfg, mesh)

        T, M = cfg["A2B_MAX_ROWS"], cfg["SAMPLING"][0]
        related = np.concatenate(
            [np.arange(3) + j * tuple_size for j in range(cfg["TRAIN_BATCH_SIZE"])]
        )
        corr = PatchCorrespondences(
            row_q_cloud=jnp.asarray(rng.choice(related, T), jnp.int32),
            row_n_cloud=jnp.asarray(rng.choice(related, T), jnp.int32),
            row_q_idx=jnp.asarray(rng.randint(0, M, T), jnp.int32),
            row_pos_idx=jnp.asarray(rng.randint(0, M, T), jnp.int32),
            row_neg_idx=jnp.asarray(rng.randint(0, M, T), jnp.int32),
            row_pair_id=jnp.asarray(
                rng.randint(0, cfg["A2B_MAX_PAIRS"], T), jnp.int32
            ),
            row_valid=jnp.asarray(rng.rand(T) < 0.5),
            num_pairs=cfg["A2B_MAX_PAIRS"],
        )
        mask = jnp.zeros((total,), bool).at[jnp.asarray(related)].set(True)
        global_clouds = host_data.make_global_batch(mesh, clouds)
        state, metrics = step(state, global_clouds, corr, mask)
        total_loss = float(metrics["total"])
        assert np.isfinite(total_loss) and total_loss > 0
