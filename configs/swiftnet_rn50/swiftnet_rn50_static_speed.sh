#!/bin/sh
# speed config: static baseline FPS
python -m blockcopy_tpu.tasks.semseg.eval --cityscapes-dir ${CITYSCAPES_DIR:-/path/to/cityscapes} \
--model-backbone resnet50 --model-checkpoint pretrained/swiftnet_rn50.pth --half --fast --single-clip-loop \
--clip-length 20 --num-clips-warmup 50 --num-clips-eval 20 --block-size 128 --block-policy static
