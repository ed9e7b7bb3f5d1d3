#!/usr/bin/env bash
# Visualization driver (reference run_demo.sh).

# path to config file
CONFIG=configs/cityscapes/panoptic-segmentation/aff/maskformer2_aff_small_bs32_45k.yaml

# path to pre-trained checkpoint (.pth or .pkl; converted on load)
CKPT=checkpoints/city_pan/aff_small.pth

# images to predict on
INPUTS="imgs/*.jpg"

# output folder
OUTPUT=demo_res

mkdir -p $OUTPUT

python demo/demo.py --config-file $CONFIG \
  --input $INPUTS \
  --output $OUTPUT \
  --opts MODEL.WEIGHTS $CKPT

# Add --blur to visualize on blurred inputs; --video-input file.mp4 or
# --webcam for video streams. The --opts flag must come last.
