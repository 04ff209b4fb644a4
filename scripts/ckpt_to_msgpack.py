#!/usr/bin/env python
"""Convert a training checkpoint (params+opt_state+step) into the
inference-weights msgpack the pipeline's RefinerModel consumes — so any
epoch checkpoint can be evaluated without waiting for the run to finish
(train.py only writes maskpls_weights.msgpack at run end).

Usage: python scripts/ckpt_to_msgpack.py CKPT OUT.msgpack
"""

import sys

from flax import serialization


def convert(ckpt_path: str, out_path: str) -> None:
    with open(ckpt_path, "rb") as fh:
        raw = serialization.msgpack_restore(fh.read())
    payload = {"params": raw["params"], "batch_stats": raw["batch_stats"]}
    with open(out_path, "wb") as fh:
        fh.write(serialization.msgpack_serialize(payload))


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
    print("wrote", sys.argv[2])
