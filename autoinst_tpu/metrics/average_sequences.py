"""Average per-sequence result JSONs (reference: metrics/average_sequences.py:4-16).

Usage: python -m autoinst_tpu.metrics.average_sequences [results_dir]
"""

from __future__ import annotations

import json
import os
import sys


def average_results(out_dir: str = "results/") -> dict:
    sums: dict[str, float] = {}
    count = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isfile(path):
            continue
        with open(path) as fh:
            data = json.load(fh)
        for k, v in data.items():
            sums[k] = sums.get(k, 0.0) + v
        count += 1
    return {k: v / count for k, v in sums.items()} if count else {}


if __name__ == "__main__":
    out = average_results(sys.argv[1] if len(sys.argv) > 1 else "results/")
    for k, v in out.items():
        print(k, v)
