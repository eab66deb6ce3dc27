"""Native C++ runtime library (PNG decode/resize/normalize, CPU NMS)."""

import os
import tempfile

import numpy as np
import pytest
from PIL import Image

import blockcopy_tpu.native as native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


@pytest.fixture(scope="module")
def png_dir():
    d = tempfile.mkdtemp()
    rs = np.random.RandomState(0)
    img = (rs.rand(64, 96, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(os.path.join(d, "rgb.png"))
    lab = (rs.rand(32, 40) * 30).astype(np.uint8)
    Image.fromarray(lab, mode="L").save(os.path.join(d, "label.png"))
    pal = Image.fromarray(lab, mode="P")
    pal.putpalette([i for i in range(256) for _ in range(3)])
    pal.save(os.path.join(d, "palette.png"))
    return d, img, lab


class TestDecode:
    def test_same_size_exact(self, png_dir):
        d, img, _ = png_dir
        mean = np.array([0.3, 0.4, 0.5], np.float32)
        std = np.array([0.2, 0.3, 0.4], np.float32)
        out = native.decode_image(os.path.join(d, "rgb.png"), 96, 64, mean,
                                  std)
        ref = (img.astype(np.float32) / 255.0 - mean) / std
        np.testing.assert_array_equal(out, ref)

    @pytest.mark.parametrize("size", [(48, 32), (192, 128), (47, 29)])
    def test_resize_matches_pil_antialias(self, png_dir, size):
        d, img, _ = png_dir
        zero = np.zeros(3, np.float32)
        one = np.ones(3, np.float32)
        out = native.decode_image(os.path.join(d, "rgb.png"), size[0],
                                  size[1], zero, one) * 255
        pil = np.asarray(Image.fromarray(img).resize(size, Image.BILINEAR),
                         np.float32)
        # <= 1/255: PIL quantizes to uint8, our path stays float
        assert np.abs(out - pil).max() <= 1.0 + 1e-5

    def test_clip_decode(self, png_dir):
        d, img, _ = png_dir
        zero = np.zeros(3, np.float32)
        one = np.ones(3, np.float32)
        p = os.path.join(d, "rgb.png")
        clip = native.decode_clip([p, p], 96, 64, zero, one)
        assert clip.shape == (2, 64, 96, 3)
        np.testing.assert_array_equal(clip[0], clip[1])

    def test_label_decode_gray_and_palette(self, png_dir):
        d, _, lab = png_dir
        got = native.decode_label(os.path.join(d, "label.png"))
        np.testing.assert_array_equal(got, lab)
        got_p = native.decode_label(os.path.join(d, "palette.png"))
        np.testing.assert_array_equal(got_p, lab)

    def test_missing_file_raises(self):
        with pytest.raises(IOError):
            native.decode_image("/nonexistent.png", 8, 8,
                                np.zeros(3, np.float32),
                                np.ones(3, np.float32))


class TestNativeNMS:
    def test_nms_matches_jax(self):
        from blockcopy_tpu.ops.nms import nms_mask
        import jax.numpy as jnp
        rs = np.random.RandomState(1)
        n = 50
        xy = rs.rand(n, 2) * 100
        wh = rs.rand(n, 2) * 30 + 5
        dets = np.concatenate(
            [xy, xy + wh, rs.rand(n, 1)], axis=1
        ).astype(np.float32)
        keep_native = set(native.nms(dets, 0.5).tolist())
        order = np.argsort(-dets[:, 4], kind="mergesort")
        keep_mask = np.asarray(nms_mask(jnp.asarray(dets[order, :4]),
                                        jnp.asarray(dets[order, 4]), 0.5))
        keep_jax = set(order[keep_mask].tolist())
        assert keep_native == keep_jax

    def test_soft_nms_decays_scores(self):
        dets = np.array([[0, 0, 10, 10, 0.9], [1, 1, 11, 11, 0.8],
                         [50, 50, 60, 60, 0.7]], np.float32)
        out, keep = native.soft_nms(dets, 0.3, method="linear")
        assert len(keep) >= 2


class TestReviewRegressions:
    def test_palette_label_uses_index_not_color(self, png_dir):
        """A palette PNG with a COLOR palette (e.g. cityscapes colorized
        labels) must decode to the palette INDEX — the grayscale identity
        palette in the other fixtures masked this."""
        d, _, lab = png_dir
        pal = Image.fromarray(lab, mode="P")
        # a real color palette: index i -> (220-i, 20, 60)
        pal.putpalette([v for i in range(256)
                        for v in ((220 - i) % 256, 20, 60)])
        p = os.path.join(d, "palette_color.png")
        pal.save(p)
        got = native.decode_label(p)
        np.testing.assert_array_equal(got, lab)

    def test_soft_nms_rows_align_with_keep(self):
        """native.soft_nms returns (kept rows, original indices) aligned
        positionally — suppressed boxes must not appear in the rows."""
        dets = np.array([[0, 0, 10, 10, 0.9],
                         [0, 0, 10, 10.2, 0.8],     # suppressed by box 0
                         [50, 50, 60, 60, 0.7]], np.float32)
        out, keep = native.soft_nms(dets, 0.3, method="naive",
                                    min_score=0.05)
        assert out.shape[0] == len(keep)
        for row, orig in zip(out, keep):
            np.testing.assert_allclose(row[:4], dets[orig, :4])
        assert 1 not in keep.tolist()

    def test_soft_nms_suppressed_neighbor_chain(self):
        """pyx-protocol chain: A(0.9) naive-kills B (removed immediately,
        reference soft_nms_cpu.pyx semantics); C overlaps B above the
        threshold but not A, and must survive with its score intact in
        BOTH implementations (C++ and numpy agree row-for-row)."""
        from blockcopy_tpu.ops.nms import soft_nms_numpy

        a = [0, 0, 10, 10, 0.9]
        b = [0, 0, 10, 30, 0.8]     # ov(A,B) ~0.355 > 0.3
        c = [0, 18, 10, 40, 0.3]    # ov(B,C) ~0.317 > 0.3; ov(A,C) = 0
        dets = np.array([a, b, c], np.float32)
        results = []
        for fn in (lambda d: native.soft_nms(d, 0.3, method="naive",
                                             min_score=0.05),
                   lambda d: soft_nms_numpy(d, 0.3, method="naive",
                                            min_score=0.05)):
            out, keep = fn(dets)
            kept = {int(k): float(r[4]) for r, k in zip(out, keep)}
            assert kept.keys() == {0, 2}, (out, keep)
            assert kept[2] == pytest.approx(0.3), (out, keep)
            results.append(sorted(kept.items()))
        assert results[0] == pytest.approx(results[1])

    def test_soft_nms_never_overlapping_low_score_box_survives(self):
        """Reference pyx decays/removes ONLY inside the positive-overlap
        (iw>0 && ih>0) branch (soft_nms_cpu.pyx): a box whose initial score
        is already below min_score but never overlaps any pivot must
        survive in both implementations."""
        from blockcopy_tpu.ops.nms import soft_nms_numpy

        dets = np.array([[0, 0, 10, 10, 0.9],
                         [100, 100, 110, 110, 0.01]],  # < min_score, no overlap
                        np.float32)
        for fn in (lambda d: native.soft_nms(d, 0.3, method="linear",
                                             min_score=0.05),
                   lambda d: soft_nms_numpy(d, 0.3, method="linear",
                                            min_score=0.05)):
            out, keep = fn(dets)
            assert set(keep.tolist()) == {0, 1}, (out, keep)
            kept = {int(k): float(r[4]) for r, k in zip(out, keep)}
            assert kept[1] == pytest.approx(0.01)
