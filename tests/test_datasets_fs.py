"""Dataset walkers against real on-disk directory structures (synthetic
PNGs): Cityscapes-seq clip assembly, label encoding, native decode path, and
the CityPersons filename arithmetic."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from blockcopy_tpu.data.cityscapes_vid import CityscapesVid
from blockcopy_tpu.data.transforms import (
    ExtCompose, ExtNormalize, ExtResize, ExtToArray,
)
from blockcopy_tpu.tasks.detection.dataset import CityPersonsClipDataset
import blockcopy_tpu.native as native

H, W = 64, 128
CLIP = 4


@pytest.fixture(scope="module")
def cityscapes_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cityscapes")
    rs = np.random.RandomState(0)
    for split in ("train", "val"):
        city = "testcity"
        img_dir = root / "leftImg8bit" / split / city
        seq_dir = root / "leftImg8bit_sequence" / split / city
        gt_dir = root / "gtFine" / split / city
        for d in (img_dir, seq_dir, gt_dir):
            d.mkdir(parents=True)
        for anchor in (19, 39):
            name = f"{city}_000042_{anchor:06d}"
            img = (rs.rand(H, W, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(img_dir / f"{name}_leftImg8bit.png")
            # raw label ids 0..33
            lab = (rs.rand(H, W) * 34).astype(np.uint8)
            Image.fromarray(lab, "L").save(
                gt_dir / f"{name}_gtFine_labelIds.png")
            for i in range(CLIP):
                fid = anchor - i
                f = (rs.rand(H, W, 3) * 255).astype(np.uint8)
                Image.fromarray(f).save(
                    seq_dir / f"{city}_000042_{fid:06d}_leftImg8bit.png")
    return str(root)


class TestCityscapesVid:
    def test_clip_assembly_and_labels(self, cityscapes_root):
        tf = ExtCompose([
            ExtResize((H, W)), ExtToArray(),
            ExtNormalize(CityscapesVid.mean, CityscapesVid.std),
        ])
        ds = CityscapesVid(cityscapes_root, split="val", transform=tf,
                           clip_length=CLIP, has_labels=True)
        assert len(ds) == 2
        clip, target, meta = ds[0]
        assert len(clip) == CLIP
        assert clip[0].shape == (H, W, 3)
        # annotated frame last (clip reversed)
        assert target.shape == (H, W)
        # labels encoded to train ids: raw id 7 (road) -> 0, 0 -> 255
        assert set(np.unique(target)) <= set(
            CityscapesVid.id_to_train_id.tolist())

    def test_annotated_frame_is_last(self, cityscapes_root):
        tf = ExtCompose([ExtToArray()])
        ds = CityscapesVid(cityscapes_root, split="val", transform=tf,
                           clip_length=CLIP, has_labels=False)
        clip, _, meta = ds[0]
        anchor = np.asarray(
            Image.open(os.path.join(
                cityscapes_root, "leftImg8bit", "val", "testcity",
                meta["relpath"].split("/")[-1])).convert("RGB"),
            np.float32) / 255.0
        np.testing.assert_allclose(clip[-1], anchor, atol=1e-6)

    @pytest.mark.skipif(not native.available(),
                        reason="native library not built")
    def test_native_path_matches_pil(self, cityscapes_root):
        tf = ExtCompose([
            ExtResize((H, W)), ExtToArray(),
            ExtNormalize(CityscapesVid.mean, CityscapesVid.std),
        ])
        pil_ds = CityscapesVid(cityscapes_root, split="val", transform=tf,
                               clip_length=CLIP, has_labels=False)
        nat_ds = CityscapesVid(cityscapes_root, split="val", transform=tf,
                               clip_length=CLIP, has_labels=False,
                               native=True, native_size=(H, W))
        c1, _, _ = pil_ds[0]
        c2, _, _ = nat_ds[0]
        for a, b in zip(c1, c2):
            # same-size: decode is exact; normalization identical
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_cli_on_cityscapes_dir(self, cityscapes_root):
        from blockcopy_tpu.tasks.semseg import eval as cli
        results = cli.main([
            "--cityscapes-dir", cityscapes_root, "--res", "256",
            "--clip-length", str(CLIP), "--num-clips-warmup", "1",
            "--num-clips-eval", "1", "--block-policy", "none",
            "--model-checkpoint", "",
        ])
        assert "Mean IoU" in results and results["fps"] > 0


class TestCityPersonsClips:
    def test_filename_arithmetic(self, cityscapes_root, tmp_path):
        gt = {
            "images": [{"id": 1, "width": W, "height": H,
                        "file_name": "testcity/testcity_000042_000019_leftImg8bit.png"}],
            "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                             "bbox": [4, 4, 10, 24], "height": 24,
                             "vis_ratio": 1.0, "ignore": 0}],
            "categories": [{"id": 1, "name": "pedestrian"}],
        }
        ann = tmp_path / "gt.json"
        ann.write_text(json.dumps(gt))
        ds = CityPersonsClipDataset(
            str(ann),
            os.path.join(cityscapes_root, "leftImg8bit_sequence", "val"),
            img_scale=(W, H), clip_length=CLIP,
        )
        clip, anns, meta = ds[0]
        assert len(clip) == CLIP
        assert clip[0].shape == (H, W, 3)
        assert meta["image_id"] == 1 and len(anns) == 1


class TestClipAugmentationSync:
    def test_stochastic_transform_identical_across_clip(self, cityscapes_root):
        """Stochastic transforms must apply the SAME draw to every frame of
        a clip (regression: independent per-frame randomness produced
        physically impossible motion, e.g. half the clip flipped)."""
        import random

        from blockcopy_tpu.data.transforms import ExtRandomHorizontalFlip

        tf = ExtCompose([
            ExtResize((H, W)), ExtRandomHorizontalFlip(p=0.5), ExtToArray(),
            ExtNormalize(CityscapesVid.mean, CityscapesVid.std),
        ])
        ds = CityscapesVid(cityscapes_root, split="val", transform=tf,
                           clip_length=CLIP, has_labels=True)
        # over several seeds, every frame's flip decision must match the
        # annotated frame's — compare each frame against a no-flip load
        plain = CityscapesVid(cityscapes_root, split="val", transform=ExtCompose([
            ExtResize((H, W)), ExtToArray(),
            ExtNormalize(CityscapesVid.mean, CityscapesVid.std),
        ]), clip_length=CLIP, has_labels=True)
        saw_flip = False
        for seed in range(6):
            random.seed(seed)
            clip, _, _ = ds[0]
            ref, _, _ = plain[0]
            flipped = [
                not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(clip, ref)
            ]
            assert len(set(flipped)) == 1, "clip frames disagree on the flip"
            saw_flip = saw_flip or flipped[0]
        assert saw_flip, "p=0.5 flip never fired across 6 seeds"
