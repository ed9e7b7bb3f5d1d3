#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (.pth / d2 .pkl) to a flax msgpack
checkpoint for this framework (TPU counterpart of reference
tools/convert-pretrained-model-to-d2.py).

Usage: python tools/convert_pretrained_model.py in.pth out.msgpack \
          [--config-file configs/...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--config-file", default="")
    args = ap.parse_args()

    from flax import serialization, traverse_util

    from autofocusformermod_tpu.engine.convert_checkpoint import (
        convert_reference_state_dict,
        load_torch_state_dict,
    )

    sd = load_torch_state_dict(args.input)
    params_flat, stats_flat = convert_reference_state_dict(sd)
    tree = {
        "params": traverse_util.unflatten_dict(params_flat),
        "batch_stats": traverse_util.unflatten_dict(stats_flat),
    }
    with open(args.output, "wb") as f:
        f.write(serialization.msgpack_serialize(tree))
    print(
        f"converted {len(params_flat)} params + {len(stats_flat)} batch stats "
        f"-> {args.output}"
    )


if __name__ == "__main__":
    main()
