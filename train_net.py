#!/usr/bin/env python
"""Training/eval CLI — the detectron2-style entry point (reference
train_net.py), TPU-native: one process per host, `jax.distributed` for
multi-host, same flags (--config-file, --eval-only, --resume, --num-gpus is
accepted-and-ignored for drop-in compatibility, KEY VALUE overrides)."""

from __future__ import annotations

import argparse
import os
import sys


def default_argument_parser():
    parser = argparse.ArgumentParser(description="autofocusformermod_tpu training")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--num-gpus", type=int, default=1,
                        help="accepted for CLI compatibility; device count "
                             "comes from the JAX runtime")
    parser.add_argument("--num-machines", type=int, default=1)
    parser.add_argument("--machine-rank", type=int, default=0)
    parser.add_argument("--dist-url", default="auto")
    parser.add_argument("--wandb-name", default=None)
    parser.add_argument(
        "opts", default=None, nargs=argparse.REMAINDER,
        help="config overrides: KEY VALUE pairs",
    )
    return parser


def setup(args):
    from autofocusformermod_tpu.config import (
        add_deeplab_config,
        add_maskformer2_config,
        get_cfg,
    )

    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    return cfg


def main(args):
    import numpy as np

    cfg = setup(args)

    # determinism (reference setup_determinism, train_net.py:370-375)
    np.random.seed(cfg.SEED or 1)

    import jax

    if int(os.environ.get("JAX_PROCESS_COUNT", "1")) > 1:
        jax.distributed.initialize()

    from autofocusformermod_tpu.engine.train import Trainer

    trainer = Trainer(cfg, wandb_name=args.wandb_name)
    trainer.resume_or_load(resume=args.resume)
    if args.eval_only:
        results = trainer.test()
        if jax.process_index() == 0:
            print(results)
        return results
    trainer.train()
    return None


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    print("Command Line Args:", args)
    main(args)
