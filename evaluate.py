#!/usr/bin/env python
"""Evaluation CLI.

Mirrors /root/reference/place_recognition/evaluate.py: flags
``--model_type --weight --dataset --exp_dir``, model_type -> config
resolution (evaluate.py:31-47), checkpoint load, then the run()
pipeline (:167-237): whole-database descriptor extraction (timed),
top-k feature-space dump (top_k=300), per-trip-pair recall/precision
aggregation and logging.

Usage:
  python evaluate.py --model_type patch_aug_net --weight exp/.../train_epoch_29_end \
      --dataset oxford
  python evaluate.py --model_type patch_aug_net --dataset synthetic   # random init smoke
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CONFIG_TABLE = {
    "patch_aug_net": "configs/patch_aug_net.yaml",
    "pptnet": "configs/pptnet_origin.yaml",
    "pptnet_l2_norm": "configs/pptnet_origin.yaml",
    "pointnet_vlad": "configs/pointnet_vlad.yaml",
    "minkloc3dv2": "configs/minkloc3dv2.yaml",
}


def get_args():
    p = argparse.ArgumentParser(description="Place Recognition Evaluation (TPU)")
    p.add_argument("--model_type", type=str, default="patch_aug_net",
                   choices=sorted(CONFIG_TABLE))
    p.add_argument("--config", type=str, default=None,
                   help="override the model_type -> config resolution")
    p.add_argument("--weight", type=str, default=None, help="checkpoint path")
    p.add_argument("--dataset", type=str, default="oxford")
    p.add_argument("--exp_dir", type=str, default="exp")
    p.add_argument("--batch_size", type=int, default=100)
    p.add_argument("--top_k", type=int, default=300, help="feature-space dump size")
    # the reference always runs the top-k dump before recall
    # (evaluate.py:171); opt out rather than in
    p.add_argument("--no_save_top_k", action="store_true",
                   help="skip the top-k rerank dump before recall")
    p.add_argument("--top_k_space", type=str, default="feat",
                   choices=["feat", "euc"], help="top-k dump space")
    p.add_argument("--no_save_descs", action="store_true",
                   help="skip the per-record global/local descriptor store")
    p.add_argument("--platform", type=str, default=None,
                   help="force jax platform (e.g. cpu)")
    p.add_argument("--devices", type=int, default=1,
                   help="shard descriptor extraction over a device mesh")
    p.add_argument("--precision", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype for the model forward: bfloat16 "
                        "runs the feature path at bf16 (f32 params/"
                        "geometry/accumulation, f32 descriptors out); "
                        "checkpoints are precision-agnostic")
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    return args


def main():
    args = get_args()

    import jax

    # near-duplicate submaps rank incorrectly under the TPU default
    # (1-pass bf16) matmul precision; 3-pass bf16 restores f32-grade
    # descriptor fidelity for ~10% throughput (see BASELINE.md)
    jax.config.update("jax_default_matmul_precision", "float32")
    import yaml

    cfg = yaml.safe_load(open(args.config or CONFIG_TABLE[args.model_type]))
    cfg["model_type"] = args.model_type
    cfg["dataset"] = args.dataset
    if args.precision != "float32":
        cfg["COMPUTE_DTYPE"] = args.precision

    import numpy as np
    import jax
    import jax.numpy as jnp

    from patchaugnet_tpu import data, train
    from patchaugnet_tpu.models import get_model
    from patchaugnet_tpu.utils import get_logger

    logger = get_logger(os.path.join(args.exp_dir, args.model_type, "eval"))
    logger.info(f"devices: {jax.devices()}")

    ds_kwargs = dict(
        num_pos=cfg.get("EVAL_POSITIVES_PER_QUERY", 4),
        num_neg=cfg.get("EVAL_NEGATIVES_PER_QUERY", 10),
    )
    if cfg["dataset"] == "synthetic":
        # mirror train.py:114-115 — the synthetic scene must regenerate
        # at the config's cloud size or checkpoints trained at
        # non-default NUM_POINTS evaluate on different-size clouds
        ds_kwargs["num_points"] = cfg["NUM_POINTS"]
    test_ds = data.PlaceRecognitionDataset(
        cfg["dataset"], for_training=False, **ds_kwargs,
    )
    logger.info(f"test records: {len(test_ds)}, trips: {test_ds.scene.trip_names}")

    model = get_model(args.model_type, cfg)
    # mirror train.py's init condition so training checkpoints restore
    # with the identical parameter tree (incl. the patch decoder)
    use_patches = args.model_type == "patch_aug_net" and (
        cfg.get("use_patch_recon") or cfg.get("use_patch_feature_contrast")
    )
    n_points = cfg["NUM_POINTS"] if cfg["dataset"] != "synthetic" else test_ds.scene.num_points
    example = jnp.zeros((args.batch_size, n_points, 3))
    # init WITH the patch decoder so training checkpoints (which carry
    # those params) restore exactly; the eval forward never uses them
    state = train.create_train_state(
        model, jax.random.PRNGKey(cfg.get("MANUAL_SEED", 123)), example, cfg,
        init_kwargs={"with_patches": True} if use_patches else None,
    )
    if args.weight:
        # accepts orbax dirs (this framework) and torch .pth via the
        # compat loader (reference checkpoints)
        if args.weight.endswith(".pth"):
            from patchaugnet_tpu.compat import load_torch_checkpoint

            variables = load_torch_checkpoint(args.weight, args.model_type, cfg, state.variables)
            state = state.replace(
                params=variables["params"], batch_stats=variables["batch_stats"]
            )
        else:
            state, _ = train.restore_checkpoint(args.weight, state)
        logger.info(f"loaded weights: {args.weight}")
    else:
        logger.info("no --weight given: evaluating a randomly initialised model")

    # write the per-record descriptor store (reference run(),
    # evaluate.py:170 save=True) — synthetic scenes have no data dir
    save_model_type = (
        args.model_type
        if not args.no_save_descs and args.dataset != "synthetic"
        else None
    )
    if args.devices > 1:
        # embarrassingly-parallel record sharding (SURVEY §5.8): batch
        # rows split over the mesh, outputs gathered replicated — incl.
        # the (global, local, center) tuple, so the sharded path writes
        # the same local-descriptor store bytes as --devices 1
        from patchaugnet_tpu import parallel

        mesh = parallel.make_mesh(args.devices)
        pfwd = None
        if save_model_type is not None:
            pfwd = parallel.build_parallel_local_forward(model, mesh)
        if pfwd is None:
            pfwd = parallel.build_parallel_forward(model, mesh)

        def forward(variables, clouds):
            return pfwd(variables, parallel.shard_batch(mesh, clouds))

        assert args.batch_size % args.devices == 0, "batch must split evenly"
        logger.info(f"sharded eval over {args.devices} devices")
    else:
        forward = None
        if save_model_type is not None:
            forward = train.build_local_forward_fn(model, cfg)
        if forward is None:
            forward = train.build_forward_fn(model, cfg)
    out = train.evaluate(
        state.variables, forward, test_ds,
        top_k=25, batch_size=args.batch_size, logger=logger,
        save_model_type=save_model_type,
    )
    if out.get("desc_time"):
        logger.info(
            f"run time: {out['desc_time']['mean_ms']:.2f} +- "
            f"{out['desc_time']['std_ms']:.2f} ms per cloud"
        )
    if not args.no_save_top_k:
        top = test_ds.find_and_save_top(
            model_type=args.model_type, top_k=args.top_k,
            space_type=args.top_k_space,
            save=args.dataset != "synthetic",
        )
        import pickle

        os.makedirs(args.exp_dir, exist_ok=True)
        path = os.path.join(
            args.exp_dir,
            f"top_k_{args.top_k_space}_{args.model_type}_{args.dataset}.pickle",
        )
        with open(path, "wb") as f:
            pickle.dump(top, f)
        logger.info(f"saved top-k dump: {path}")
    return out


if __name__ == "__main__":
    main()
