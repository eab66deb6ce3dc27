#!/bin/sh
# speed config: random policy FPS
python -m blockcopy_tpu.tasks.semseg.eval --cityscapes-dir ${CITYSCAPES_DIR:-/path/to/cityscapes} \
--model-backbone resnet18 --model-checkpoint pretrained/swiftnet_rn18.pth --half --fast --single-clip-loop \
--clip-length 20 --num-clips-warmup 50 --num-clips-eval 20 --block-size 128 --block-policy random
