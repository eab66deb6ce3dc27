#!/bin/sh
# accuracy config: random 50% policy oracle
python -m blockcopy_tpu.tasks.semseg.eval --cityscapes-dir ${CITYSCAPES_DIR:-/path/to/cityscapes} \
--model-backbone resnet50 --model-checkpoint pretrained/swiftnet_rn50.pth --half \
--clip-length 20 --num-clips-warmup 500 --num-clips-eval -1 --block-size 128 --block-policy random
