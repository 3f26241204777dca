"""Pkl dataset → HDF5 export (ref copenet_real_data/scripts/copenet_data_hdf5.py).

Packs a per-sample-pkl AerialPeople dataset into one HDF5 file with a group
per sample, preserving the reference key names.

Usage: python -m airpose_tpu.tools.to_hdf5 --datapath DIR --split train --out f.h5
"""

import argparse
import os
import pickle

import numpy as np


def export_split(datapath: str, split: str, out_path: str) -> int:
    import h5py

    with open(os.path.join(datapath, "dataset", f"{split}_pkls.pkl"), "rb") as f:
        files = pickle.load(f)
    with h5py.File(out_path, "w") as h5:
        for i, path in enumerate(files):
            with open(path, "rb") as f:
                sample = pickle.load(f)
            g = h5.create_group(f"{i:06d}")
            for key, val in sample.items():
                if isinstance(val, dict):
                    sub = g.create_group(key)
                    for k2, v2 in val.items():
                        sub.create_dataset(k2, data=np.asarray(v2))
                elif isinstance(val, str):
                    g.attrs[key] = val
                else:
                    g.create_dataset(key, data=np.asarray(val))
    return len(files)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--datapath", required=True)
    p.add_argument("--split", default="train", choices=("train", "test"))
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    n = export_split(args.datapath, args.split, args.out)
    print(f"exported {n} samples to {args.out}")


if __name__ == "__main__":
    main()
