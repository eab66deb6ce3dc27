# CSP + BlockCopy on CityPersons, execution target 0.50.
# Translation of the reference config
# Pedestron/configs/elephant/cityperson/csp_r50_clip_blockcopy_050.py for the
# blockcopy_tpu detection CLI (loaded via blockcopy_tpu.utils.registry.
# load_config).  The 0.40 / 0.50 variants differ only in block_target.
CLIP_LENGTH = 20
model = dict(
    type="CSPBlockCopy",
    blockcopy_settings=dict(
        block_policy="rl_objectdetection",
        block_num_classes=1,
        block_optim_lr=0.0001,
        block_optim_wd=0.0001,
        block_optim_momentum=0,
        block_target=0.50,
        block_complexity_weight=5,
        block_size=128,
        block_train_interval=4,
        block_cost_momentum=0.9,
        block_policy_verbose=True,
    ),
    backbone=dict(
        type="ResNet",
        depth=50,
        num_stages=4,
        strides=(1, 2, 2, 1),
        dilations=(1, 1, 1, 2),
        out_indices=(1, 2, 3),
    ),
    neck=dict(
        type="CSPNeck",
        in_channels=[512, 1024, 2048],
        out_channels=256,
    ),
    bbox_head=dict(
        type="CSPHead",
        num_classes=2,
        in_channels=768,
        stacked_convs=1,
        feat_channels=256,
        strides=[4],
    ),
)
test_cfg = dict(
    nms_pre=1000,
    min_bbox_size=0,
    score_thr=0.1,
    nms=dict(type="nms", iou_thr=0.5),
    max_per_img=100,
)
data = dict(
    imgs_per_gpu=1,
    test=dict(
        type="CityPersonsClipDataset",
        ann_file="datasets/CityPersons/val_gt.json",
        img_prefix="datasets/cityscapes/leftImg8bit_sequence/val",
        img_scale=(2048, 1024),
        clip_length=CLIP_LENGTH,
    ),
    train=dict(
        type="CityPersonsClipDataset",
        ann_file="datasets/CityPersons/train.json",
        img_prefix="datasets/cityscapes/leftImg8bit_sequence/train",
        img_scale=(2048, 1024),
        clip_length=CLIP_LENGTH,
    ),
)
