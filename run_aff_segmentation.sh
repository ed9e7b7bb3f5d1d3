#!/usr/bin/env bash
# Train/eval driver (reference run_aff_segmentation.sh on the TPU stack:
# one process per HOST; device parallelism is the GSPMD mesh, so there is
# no --num-gpus — set JAX_PROCESS_COUNT/coordinator env for multi-host).

# path to config file
CONFIG=configs/cityscapes/panoptic-segmentation/aff/maskformer2_aff_small_bs32_45k.yaml

# checkpoint path for eval / init
RESUME=checkpoints/city_pan/aff_small.pth

# output folder
OUTPUT=outputs/

python train_net.py \
  --config-file $CONFIG \
  --resume \
  --eval-only \
  MODEL.WEIGHTS $RESUME \
  OUTPUT_DIR $OUTPUT

# Remove '--resume', '--eval-only' and 'MODEL.WEIGHTS' to train from fresh.
# With '--resume', MODEL.WEIGHTS is overridden by the latest orbax
# checkpoint under $OUTPUT/checkpoints when one exists (auto-resume).
# KEY VALUE config overrides go last, after all flags.
