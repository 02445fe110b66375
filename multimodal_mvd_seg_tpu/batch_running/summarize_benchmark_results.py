"""Benchmark result collection.

Parity: reference nnunetv2/batch_running/benchmarking/
summarize_benchmark_results.py — walk the results tree, read every
``benchmark_result.json`` written by the benchmark trainers and print/return
a table of fastest-epoch times per dataset/configuration/device.
"""

import os
from typing import List, Optional

from .. import paths
from ..utils.files import isdir, isfile, join, load_json, subdirs


def summarize_benchmark_results(results_root: Optional[str] = None,
                                print_table: bool = True) -> List[dict]:
    root = results_root or paths.get_results()
    rows = []
    for dataset in sorted(subdirs(root, join=False)):
        dpath = join(root, dataset)
        if not isdir(dpath):
            continue
        for model in sorted(subdirs(dpath, join=False)):
            mpath = join(dpath, model)
            for fold in sorted(subdirs(mpath, join=False)):
                f = join(mpath, fold, "benchmark_result.json")
                if not isfile(f):
                    continue
                for key, r in load_json(f).items():
                    rows.append({
                        "dataset": dataset, "model": model, "fold": fold,
                        "device": r.get("device_kind", r.get("gpu_name")),
                        "num_devices": r.get("num_devices",
                                             r.get("num_gpus", 1)),
                        "fastest_epoch": r.get("fastest_epoch"),
                    })
    if print_table and rows:
        hdr = ["dataset", "model", "fold", "device", "num_devices",
               "fastest_epoch"]
        widths = [max(len(str(r[h])) for r in rows + [dict.fromkeys(hdr, h)])
                  for h in hdr]
        print("  ".join(h.ljust(w) for h, w in zip(hdr, widths)))
        for r in rows:
            print("  ".join(str(r[h]).ljust(w) for h, w in zip(hdr, widths)))
    return rows
