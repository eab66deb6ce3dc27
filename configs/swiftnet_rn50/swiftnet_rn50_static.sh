#!/bin/sh
# accuracy config: static (dense) baseline
# (mirrors reference configs/swiftnet_rn50/swiftnet_rn50_static.sh; note the
# reference script's misspelled "--block-policy stati" is not replicated)
python -m blockcopy_tpu.tasks.semseg.eval --cityscapes-dir ${CITYSCAPES_DIR:-/path/to/cityscapes} \
--model-backbone resnet50 --model-checkpoint pretrained/swiftnet_rn50.pth --half \
--clip-length 20 --num-clips-warmup 500 --num-clips-eval -1 --block-size 128 --block-policy static
