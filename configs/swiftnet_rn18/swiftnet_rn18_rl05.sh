#!/bin/sh
# accuracy config: online-RL policy, execution target 0.5
python -m blockcopy_tpu.tasks.semseg.eval --cityscapes-dir ${CITYSCAPES_DIR:-/path/to/cityscapes} \
--model-backbone resnet18 --model-checkpoint pretrained/swiftnet_rn18.pth --half \
--clip-length 20 --num-clips-warmup 500 --num-clips-eval -1 --block-size 128 --block-policy rl_semseg --block-target 0.5
