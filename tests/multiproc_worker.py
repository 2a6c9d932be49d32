"""Worker for tests/test_multiprocess.py: one process of a REAL
2-process ``jax.distributed`` CPU cluster (4 virtual devices each), or
the single-process 8-device control.

Each mode runs the identical tiny PatchAugNet train step
(__graft_entry__.TINY_PARAM, the dryrun config) over an 8-device
1-D data mesh, feeding the global batch the multi-host way:
``host_data.host_batch_slice`` -> this process's rows only ->
``host_data.make_global_batch``. Prints ``LOSS <repr>`` on every
process; the test asserts cross-process bit-equality and
single-vs-multi-process closeness (XLA-CPU reassociation makes
cross-invocation equality only approximate — CLAUDE.md).

Usage:
  python multiproc_worker.py single
  python multiproc_worker.py 127.0.0.1:<port> <pid> <nproc>
"""
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

N_GLOBAL_DEVICES = 8


def main() -> None:
    mode = sys.argv[1]
    nproc = 1 if mode == "single" else int(sys.argv[3])
    local = N_GLOBAL_DEVICES // nproc
    flags = [
        f
        for f in os.environ.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    flags.append(f"--xla_force_host_platform_device_count={local}")
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax

    jax.config.update("jax_platforms", "cpu")
    if mode != "single":
        pid = int(sys.argv[2])
        jax.distributed.initialize(
            coordinator_address=mode, num_processes=nproc, process_id=pid
        )
        assert jax.process_count() == nproc
    assert len(jax.devices()) == N_GLOBAL_DEVICES, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import TINY_PARAM
    from patchaugnet_tpu import parallel, train
    from patchaugnet_tpu.losses import PatchCorrespondences
    from patchaugnet_tpu.models import get_model
    from patchaugnet_tpu.parallel import host_data

    cfg = dict(TINY_PARAM)
    tuple_size = (
        1 + cfg["TRAIN_POSITIVES_PER_QUERY"] + cfg["TRAIN_NEGATIVES_PER_QUERY"] + 1
    )
    batch = cfg["TRAIN_BATCH_SIZE"]
    while (batch * tuple_size) % N_GLOBAL_DEVICES:
        batch += 1
    cfg["TRAIN_BATCH_SIZE"] = batch
    total = batch * tuple_size

    model = get_model("patch_aug_net", cfg)
    n = cfg["NUM_POINTS"]
    rng = np.random.RandomState(0)
    clouds = rng.rand(total, n, 3).astype(np.float32)

    # identical deterministic init on every process, then globalised to
    # a replicated array over the full (partly non-addressable) mesh
    state = train.create_train_state(
        model, jax.random.PRNGKey(0), jnp.asarray(clouds), cfg,
        init_kwargs={"with_patches": True},
    )
    mesh = parallel.make_mesh(N_GLOBAL_DEVICES)
    rep = NamedSharding(mesh, P())

    def globalise(x):
        if not hasattr(x, "shape"):
            return x
        host = np.asarray(x)
        return jax.make_array_from_callback(host.shape, rep, lambda idx: host[idx])

    state = jax.tree_util.tree_map(globalise, state)

    step = parallel.build_parallel_train_step(model, cfg, mesh)

    T, M = cfg["A2B_MAX_ROWS"], cfg["SAMPLING"][0]
    n_related = cfg["TRAIN_BATCH_SIZE"] * (1 + cfg["TRAIN_POSITIVES_PER_QUERY"])
    related = np.arange(0, total, total // n_related)[:n_related]
    corr = PatchCorrespondences(
        row_q_cloud=jnp.asarray(rng.choice(related, T), jnp.int32),
        row_n_cloud=jnp.asarray(rng.choice(related, T), jnp.int32),
        row_q_idx=jnp.asarray(rng.randint(0, M, T), jnp.int32),
        row_pos_idx=jnp.asarray(rng.randint(0, M, T), jnp.int32),
        row_neg_idx=jnp.asarray(rng.randint(0, M, T), jnp.int32),
        row_pair_id=jnp.asarray(rng.randint(0, cfg["A2B_MAX_PAIRS"], T), jnp.int32),
        row_valid=jnp.asarray(rng.rand(T) < 0.5),
        num_pairs=cfg["A2B_MAX_PAIRS"],
    )
    corr = jax.tree_util.tree_map(globalise, corr)
    mask = np.zeros((total,), bool)
    mask[related] = True

    # THE multi-host contract under test: load only this host's rows
    sl = host_data.host_batch_slice(total)
    global_clouds = host_data.make_global_batch(mesh, clouds[sl])
    global_mask = host_data.make_global_batch(mesh, mask[sl])

    new_state, metrics = step(state, global_clouds, corr, global_mask)
    jax.block_until_ready(new_state.params)
    loss = float(metrics["total"])
    assert np.isfinite(loss)
    print(f"LOSS {loss!r}", flush=True)
    if mode != "single":
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
