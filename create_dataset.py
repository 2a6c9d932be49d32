#!/usr/bin/env python
"""Dataset creation CLI.

Mirrors /root/reference/datasets/place_recognition_dataset.py __main__
(create_pointnet_vlad_dataset, :150-173): walks trip dirs under
PCR_DATA_ROOT/<dataset>, builds positive/negative tuples by KDTree
radius search, and pickles everything for training/eval.

Usage:
  PCR_DATA_ROOT=/path/to/benchmark_datasets \
      python create_dataset.py --datasets oxford university
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser(description="Create place-recognition datasets")
    p.add_argument("--datasets", nargs="+", default=["oxford"],
                   help="registry names (see patchaugnet_tpu.data.dataset_info)")
    p.add_argument("--splits", nargs="+", default=["train", "test"],
                   choices=["train", "test"])
    args = p.parse_args()

    from patchaugnet_tpu.data import SceneDataset

    for name in args.datasets:
        for split in args.splits:
            print(f"Create Place Recognition Dataset: {name} [{split}]")
            ds = SceneDataset(name, for_training=split == "train")
            ds.create()
            print(
                f"  trips: {ds.trip_names}, records: {len(ds.records)}, "
                f"pickles -> {ds.pickle_dir()}"
            )


if __name__ == "__main__":
    main()
