#!/usr/bin/env python
"""Export a trained model as a self-contained serving artifact.

Loads weights exactly like evaluate.py (orbax dirs or reference torch
``.pth`` via compat), captures the jitted eval forward with the weights
baked in (``patchaugnet_tpu.serving``), and writes one StableHLO
artifact per requested batch size plus a JSON sidecar each. A serving
host runs descriptors with only jax + the artifact:

    fwd, meta = patchaugnet_tpu.serving.load_artifact("pan_b32.shlo")
    descs = fwd(clouds)          # (32, 4096, 3) f32 -> (32, 256) f32

Export ON the target platform to bake its fastest kernels (Pallas ops
dispatch at trace time): a TPU-host export embeds the Mosaic kernels;
a CPU-host export is portable but takes the XLA fallbacks.

Usage:
  python export_serving.py --model_type patch_aug_net \
      --weight exp/.../train_epoch_29_end --out exp/serving \
      --batch_sizes 32 100 [--precision bfloat16] [--with_local]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from evaluate import CONFIG_TABLE


def get_args():
    p = argparse.ArgumentParser(description="Serving artifact export (TPU)")
    p.add_argument("--model_type", type=str, default="patch_aug_net",
                   choices=sorted(CONFIG_TABLE))
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--weight", type=str, default=None,
                   help="orbax checkpoint dir or reference .pth (omit "
                        "for a random-init artifact, e.g. smoke tests)")
    p.add_argument("--out", type=str, default="exp/serving",
                   help="output directory")
    p.add_argument("--batch_sizes", type=int, nargs="+", default=[32])
    p.add_argument("--n_points", type=int, default=None,
                   help="override the config NUM_POINTS")
    p.add_argument("--precision", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--with_local", action="store_true",
                   help="also export the (global, local, center) tuple "
                        "artifact for the rerank store")
    p.add_argument("--platform", type=str, default=None,
                   help="force jax platform (e.g. cpu)")
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    return args


def main():
    args = get_args()

    import jax

    jax.config.update("jax_default_matmul_precision", "float32")
    import yaml
    import jax.numpy as jnp

    cfg = yaml.safe_load(open(args.config or CONFIG_TABLE[args.model_type]))
    cfg["model_type"] = args.model_type
    if args.precision != "float32":
        cfg["COMPUTE_DTYPE"] = args.precision

    from patchaugnet_tpu import serving, train
    from patchaugnet_tpu.models import get_model

    model = get_model(args.model_type, cfg)
    n_points = args.n_points or cfg["NUM_POINTS"]
    use_patches = args.model_type == "patch_aug_net" and (
        cfg.get("use_patch_recon") or cfg.get("use_patch_feature_contrast")
    )
    example = jnp.zeros((args.batch_sizes[0], n_points, 3))
    state = train.create_train_state(
        model, jax.random.PRNGKey(cfg.get("MANUAL_SEED", 123)), example, cfg,
        init_kwargs={"with_patches": True} if use_patches else None,
    )
    if args.weight:
        if args.weight.endswith(".pth"):
            from patchaugnet_tpu.compat import load_torch_checkpoint

            variables = load_torch_checkpoint(
                args.weight, args.model_type, cfg, state.variables
            )
        else:
            state, _ = train.restore_checkpoint(args.weight, state)
            variables = state.variables
    else:
        variables = state.variables
        print("no --weight: exporting a randomly initialised model")

    os.makedirs(args.out, exist_ok=True)
    meta = {
        "model_type": args.model_type,
        "weight": args.weight,
        "precision": args.precision,
        "n_points": n_points,
    }
    flavours = [("desc", False)] + ([("local", True)] if args.with_local else [])
    for b in args.batch_sizes:
        for tag, with_local in flavours:
            exported = serving.export_descriptor_fn(
                model, variables, b, n_points, with_local=with_local
            )
            path = os.path.join(
                args.out, f"{args.model_type}_{tag}_b{b}.shlo"
            )
            serving.save_artifact(
                exported, path, {**meta, "batch_size": b, "flavour": tag}
            )
            print(f"wrote {path} ({os.path.getsize(path)/1e6:.1f} MB, "
                  f"platforms={list(exported.platforms)})")


if __name__ == "__main__":
    main()
