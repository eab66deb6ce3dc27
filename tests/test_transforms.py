"""Paired transforms: label handling (nearest/no-color-op/ignore-fill) and
shape invariants for the train-side augmentation set."""

import numpy as np
from PIL import Image

from blockcopy_tpu.data import transforms as et


def make_pair(w=64, h=48):
    rs = np.random.RandomState(0)
    img = Image.fromarray(rs.randint(0, 255, (h, w, 3), np.uint8))
    lbl = Image.fromarray((rs.randint(0, 19, (h, w))).astype(np.uint8))
    return img, lbl


def test_vertical_flip_pairs():
    img, lbl = make_pair()
    t = et.ExtRandomVerticalFlip(p=1.0)
    fi, fl = t(img, lbl)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(img)[::-1])
    np.testing.assert_array_equal(np.asarray(fl), np.asarray(lbl)[::-1])


def test_rotation_label_stays_integer_and_ignore_filled():
    img, lbl = make_pair()
    t = et.ExtRandomRotation((30, 30), ignore_index=255)
    ri, rl = t(img, lbl)
    arr = np.asarray(rl)
    assert ri.size == img.size
    # rotation corners are filled with the ignore index
    assert arr[0, 0] == 255
    # nearest interpolation: no new label values below ignore
    assert set(np.unique(arr)) <= set(range(19)) | {255}


def test_blur_leaves_label_untouched():
    img, lbl = make_pair()
    t = et.ExtGaussianBlur(radius=1.5, p=1.0)
    bi, bl = t(img, lbl)
    np.testing.assert_array_equal(np.asarray(bl), np.asarray(lbl))
    assert not np.array_equal(np.asarray(bi), np.asarray(img))


def test_pad_to_divisor():
    img, lbl = make_pair(w=50, h=30)
    t = et.ExtPad(divisor=32, ignore_index=255)
    pi, pl = t(img, lbl)
    assert pi.size == (64, 32)
    assert np.asarray(pl)[31, 0] == 255  # padded row is ignore


def test_scale_choice_is_discrete():
    img, lbl = make_pair(w=64, h=64)
    t = et.ExtRandomScaleChoice(scales=(0.5,))
    si, sl = t(img, lbl)
    assert si.size == (32, 32) and sl.size == (32, 32)


def test_eval_pipeline_shapes():
    img, lbl = make_pair(w=100, h=60)
    pipe = et.ExtCompose([
        et.ExtResize((48, 96)), et.ExtToArray(),
        et.ExtNormalize(mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)),
    ])
    a, l = pipe(img, lbl)
    assert a.shape == (48, 96, 3) and a.dtype == np.float32
    assert l.shape == (48, 96) and l.dtype == np.int64
