#!/usr/bin/env python
"""Training CLI.

Mirrors the reference driver
(/root/reference/place_recognition/train_place_recognition.py): flags
``--config --dataset --resume --eval``, YAML config with the same keys,
per-epoch checkpoints, optional epoch eval. Extra TPU-era flags:
``--devices N`` shards the tuple-batch over a data-parallel mesh,
``--max-batches`` bounds an epoch for smoke runs.

Usage:
  python train.py --config configs/patch_aug_net.yaml --dataset oxford
  python train.py --config configs/patch_aug_net.yaml --dataset synthetic \
      --max-batches 5 --epochs 1        # no data on disk needed
"""
import argparse
import os
import random
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def get_args():
    p = argparse.ArgumentParser(description="Point Cloud Place Recognition (TPU)")
    p.add_argument("--config", type=str, default="configs/patch_aug_net.yaml")
    p.add_argument(
        "--dataset", type=str, default="oxford",
        help="oxford | university | residential | business | hankou | campus |"
             " sejong | dcc_* | kitti360_* | synthetic",
    )
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--eval", action="store_true", help="evaluation only")
    p.add_argument("--devices", type=int, default=None,
                   help="data-parallel mesh size (default: all devices)")
    p.add_argument("--epochs", type=int, default=None, help="override MAX_EPOCH")
    p.add_argument("--max-batches", type=int, default=None,
                   help="cap batches per epoch (smoke runs)")
    p.add_argument("--platform", type=str, default=None,
                   help="force jax platform (e.g. cpu); the axon TPU "
                        "plugin ignores JAX_PLATFORMS so this goes "
                        "through jax.config")
    p.add_argument("--exp_dir", type=str, default=None,
                   help="override the config EXP_DIR")
    p.add_argument("--num-points", type=int, default=None,
                   help="override NUM_POINTS (and the synthetic scene size)")
    p.add_argument("--synthetic-noise", type=float, default=None,
                   help="synthetic dataset only: per-point gaussian "
                        "noise stddev added to every scene cloud "
                        "(seeded; the bench_quality.py hardening, so "
                        "random-init recall starts low and the quality "
                        "lift is attributable to training)")
    p.add_argument("--print-flops", action="store_true",
                   help="print XLA cost-analysis FLOPs at startup "
                        "(the reference's fvcore report)")
    p.add_argument("--precision", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="model compute dtype (default: config "
                        "COMPUTE_DTYPE or float32). bfloat16 runs the "
                        "backbone fwd/bwd at bf16 with f32 params/"
                        "optimizer/BN-stats; losses and the patch "
                        "branch stay f32")
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import yaml

    cfg = yaml.safe_load(open(args.config))
    cfg["dataset"] = args.dataset
    cfg["resume"] = args.resume
    cfg["eval"] = args.eval
    if args.epochs is not None:
        cfg["MAX_EPOCH"] = args.epochs
    if args.exp_dir is not None:
        cfg["EXP_DIR"] = args.exp_dir
    if args.num_points is not None:
        cfg["NUM_POINTS"] = args.num_points
    if args.precision is not None:
        if args.precision == "float32":
            cfg.pop("COMPUTE_DTYPE", None)
        else:
            cfg["COMPUTE_DTYPE"] = args.precision
    cfg["event_dir"] = os.path.join(
        cfg["EXP_DIR"], cfg["model_type"], "events",
        datetime.now().strftime("%Y-%m-%dT%H-%M-%S"),
    )
    cfg["save_path"] = os.path.join(cfg["EXP_DIR"], cfg["model_type"], "saved_model")
    os.makedirs(cfg["save_path"], exist_ok=True)
    return cfg, args


def main():
    cfg, args = get_args()

    import jax

    # near-duplicate submaps rank incorrectly under the TPU default
    # (1-pass bf16) matmul precision; 3-pass bf16 restores f32-grade
    # descriptor fidelity for ~10% throughput (see BASELINE.md)
    jax.config.update("jax_default_matmul_precision", "float32")

    import numpy as np

    random.seed(cfg.get("MANUAL_SEED", 123))
    np.random.seed(cfg.get("MANUAL_SEED", 123))

    import jax
    import jax.numpy as jnp

    from patchaugnet_tpu import data, parallel, train
    from patchaugnet_tpu.models import get_model
    from patchaugnet_tpu.utils import get_logger, MetricsWriter

    logger = get_logger(cfg["event_dir"])
    logger.info(f"devices: {jax.devices()}")
    logger.info(cfg)
    writer = MetricsWriter(cfg["event_dir"])

    model_type = cfg["model_type"]
    use_patches = model_type == "patch_aug_net" and (
        cfg.get("use_patch_recon") or cfg.get("use_patch_feature_contrast")
    )

    ds_kwargs = dict(
        num_pos=cfg["TRAIN_POSITIVES_PER_QUERY"],
        num_neg=cfg["TRAIN_NEGATIVES_PER_QUERY"],
    )
    if cfg["dataset"] == "synthetic":
        ds_kwargs["num_points"] = cfg["NUM_POINTS"]
    train_ds = data.PlaceRecognitionDataset(
        cfg["dataset"], for_training=True,
        load_overlap_indices=use_patches, **ds_kwargs,
    )
    test_ds = data.PlaceRecognitionDataset(
        cfg["dataset"], for_training=False, **ds_kwargs,
    )
    if args.synthetic_noise:
        if cfg["dataset"] != "synthetic":
            raise SystemExit("--synthetic-noise requires --dataset synthetic")
        for ds in (train_ds, test_ds):
            r = np.random.RandomState(7)
            ds.scene._clouds = ds.scene._clouds + (
                r.randn(*ds.scene._clouds.shape).astype(np.float32)
                * args.synthetic_noise
            )
            ds.scene._pc_cache.clear()
            ds.scene._pc_order.clear()
        logger.info(f"synthetic scene hardened: noise {args.synthetic_noise}")
    logger.info(
        f"train records: {len(train_ds)}, test records: {len(test_ds)}, "
        f"trips: {train_ds.scene.trip_names}"
    )

    model = get_model(model_type, cfg)
    use_smoothap = cfg.get("LOSS_FUNCTION", "").lower() == "truncatedsmoothap"
    tuple_size = 1 + cfg["TRAIN_POSITIVES_PER_QUERY"] + cfg["TRAIN_NEGATIVES_PER_QUERY"] + 1
    n_dev = args.devices or len(jax.devices())
    if n_dev > 1:
        # the flattened tuple batch must split evenly over the mesh —
        # bump the batch like the driver dryrun (__graft_entry__.py)
        bumped = cfg["TRAIN_BATCH_SIZE"]
        while (bumped * tuple_size) % n_dev:
            bumped += 1
        if bumped != cfg["TRAIN_BATCH_SIZE"]:
            logger.info(
                f"TRAIN_BATCH_SIZE {cfg['TRAIN_BATCH_SIZE']} -> {bumped} "
                f"({bumped * tuple_size} clouds split over {n_dev} devices)"
            )
            cfg["TRAIN_BATCH_SIZE"] = bumped
    n_points = cfg["NUM_POINTS"] if cfg["dataset"] != "synthetic" else train_ds.scene.num_points
    example = jnp.zeros((cfg["TRAIN_BATCH_SIZE"] * tuple_size, n_points, 3))
    steps_per_epoch = max(len(train_ds) // cfg["TRAIN_BATCH_SIZE"], 1)
    smoothap_step = tx_override = None
    if use_smoothap:
        # MinkLoc3Dv2 pipeline: AdamW + MultiStepLR built up front, not
        # swapped in post-hoc (config_baseline.txt lr/weight_decay/
        # scheduler_milestones)
        sched = train.multistep_schedule(
            cfg["BASE_LEARNING_RATE"],
            cfg.get("scheduler_milestones", [250, 350]), steps_per_epoch,
        )
        smoothap_step, tx_override = train.build_smoothap_train_step(
            model, sched, weight_decay=cfg.get("WEIGHT_DECAY"),
            tau1=cfg.get("tau1", 0.01),
            positives_per_query=cfg.get("positives_per_query", 4),
        )
    state = train.create_train_state(
        model, jax.random.PRNGKey(cfg.get("MANUAL_SEED", 123)), example, cfg,
        steps_per_epoch=steps_per_epoch,
        init_kwargs={"with_patches": True} if use_patches else None,
        tx=tx_override,
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    logger.info(f"Parameters: {n_params:,}")
    if args.print_flops:
        # reference prints fvcore GFLOPs on a 4x1x4096x3 probe at startup
        # (train_place_recognition.py:551-553)
        from patchaugnet_tpu.utils import flops, parameter_count

        probe = jnp.zeros((4, cfg["NUM_POINTS"], 3))
        f = flops(lambda v, a: model.apply(v, a, train=False), state.variables, probe)
        if f:
            logger.info(f"FLOPs: {f / 4 / 1e9:.4f} GFLOPs/cloud")
        logger.info(f"Parameter table: {parameter_count(state.params)}")

    starting_epoch = 0
    if cfg["resume"]:
        path = cfg["resume"]
        if not os.path.exists(path):
            path = os.path.join(cfg["save_path"], cfg["resume"])
        state, starting_epoch = train.restore_checkpoint(path, state)
        logger.info(f"Resumed from {path} at epoch {starting_epoch}")

    place_batch = None
    if n_dev > 1:
        mesh = parallel.make_mesh(n_dev)
        step = parallel.build_parallel_train_step(model, cfg, mesh)
        # feed through the per-host assembly path (host_data.py): on one
        # host this is a sharded device_put; on a pod slice each process
        # contributes only its shard via make_array_from_process_local_data
        place_batch = lambda c: parallel.make_global_batch(
            mesh, np.asarray(c, np.float32)
        )
        logger.info(f"data-parallel mesh over {n_dev} devices")
    else:
        step = train.build_train_step(model, cfg)
    forward = train.build_forward_fn(model, cfg)
    center_fn = train.build_center_fn(cfg["SAMPLING"][0]) if use_patches else None

    if cfg["eval"]:
        train.evaluate(
            state.variables, forward, test_ds, logger=logger, writer=writer,
            epoch=starting_epoch,
        )
        writer.close()
        return

    if use_smoothap:
        # MinkLoc3Dv2 training path: flat batches + (B,B) masks, with
        # the same per-epoch eval + metrics the tuple path gets
        import random as _random

        rng = _random.Random(cfg.get("MANUAL_SEED", 123))
        eval_every = cfg.get("EVAL_EVERY_N_EPOCHS", 1)
        for epoch in range(starting_epoch, cfg["MAX_EPOCH"]):
            logger.info(f"**** EPOCH {epoch:03d} (SmoothAP) ****")
            state, summary = train.train_one_epoch_smoothap(
                state, smoothap_step, train_ds.scene,
                batch_size=cfg.get("SMOOTHAP_BATCH_SIZE", 16),
                batches_per_epoch=args.max_batches or steps_per_epoch,
                rng=rng, logger=logger,
            )
            writer.add_scalars(
                "epoch_loss",
                {f"train_{k}": v for k, v in summary.items()},
                epoch + 1,
            )
            train.save_checkpoint(cfg["save_path"], state, epoch)
            if (epoch + 1) % eval_every == 0 and len(test_ds) > 0:
                train.evaluate(
                    state.variables, forward, test_ds, logger=logger,
                    writer=writer, epoch=epoch,
                )
        writer.close()
        return

    total_iterations = 0
    # the reference evals only on --eval (its per-epoch eval is commented
    # out, train_place_recognition.py:564-566); EVAL_EVERY_N_EPOCHS is the
    # TPU-era opt-in that turns it back on for quality curves (the
    # SmoothAP path above already honours it)
    eval_every = cfg.get("EVAL_EVERY_N_EPOCHS", 0)
    for epoch in range(starting_epoch, cfg["MAX_EPOCH"]):
        logger.info(f"**** EPOCH {epoch:03d} ****")
        summary = train.train_one_epoch(
            state, step, train_ds, cfg, epoch,
            forward_fn=forward, center_fn=center_fn, writer=writer,
            logger=logger, total_iterations=total_iterations,
            max_batches=args.max_batches, save_dir=cfg["save_path"],
            place_batch=place_batch,
        )
        state = summary.pop("state")
        total_iterations = summary["total_iterations"]
        logger.info(f"epoch {epoch}: {summary}")
        if eval_every and (epoch + 1) % eval_every == 0 and len(test_ds) > 0:
            train.evaluate(
                state.variables, forward, test_ds, logger=logger,
                writer=writer, epoch=epoch,
            )
    writer.close()


if __name__ == "__main__":
    main()
