"""Information-gain parity vs the reference's actual implementations
(``blockcopy/blockcopy/policy/information_gain.py``): the semseg KL map and
the detection IoU instance-mask gain drive the REINFORCE reward, so their
numerics decide where the policy learns to execute."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from test_reference_model_parity import _install_blockcopy_stub  # noqa: E402

REF_BC = "/root/reference/blockcopy"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_BC),
                                reason="reference tree not available")


class _TorchCPUProxy:
    """The reference's ``build_instance_mask_iou_gain`` hard-codes
    ``device='cuda'`` for the mask allocation; this proxy drops device
    kwargs so the reference code runs on CPU torch unchanged otherwise."""

    def __getattr__(self, name):
        return getattr(torch, name)

    @staticmethod
    def zeros(*a, **k):
        k.pop("device", None)
        return torch.zeros(*a, **k)

    @staticmethod
    def tensor(*a, **k):
        k.pop("device", None)
        return torch.tensor(*a, **k)


@pytest.fixture(scope="module")
def ref_ig():
    _install_blockcopy_stub()
    if REF_BC not in sys.path:
        sys.path.insert(0, REF_BC)
    import blockcopy.policy.information_gain as ig_mod
    ig_mod.torch = _TorchCPUProxy()
    return ig_mod


def test_semseg_kl_matches_reference(ref_ig):
    from blockcopy_tpu.policy.information_gain import semseg_information_gain

    rs = np.random.RandomState(0)
    outputs = rs.randn(1, 19, 64, 128).astype(np.float32) * 3
    prev = outputs + rs.randn(1, 19, 64, 128).astype(np.float32)

    ref = ref_ig.InformationGainSemSeg(19)
    with torch.no_grad():
        want = ref({"outputs": torch.from_numpy(outputs),
                    "outputs_prev": torch.from_numpy(prev)}).numpy()

    got = np.asarray(semseg_information_gain(
        jnp.asarray(outputs.transpose(0, 2, 3, 1)),
        jnp.asarray(prev.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def _random_bbox_results(seed, n_boxes, w=256, h=128):
    rs = np.random.RandomState(seed)
    arr = np.zeros((n_boxes, 5), np.float32)
    if n_boxes:
        x1 = rs.uniform(0, w - 30, n_boxes)
        y1 = rs.uniform(0, h - 30, n_boxes)
        arr[:, 0] = x1
        arr[:, 1] = y1
        arr[:, 2] = np.minimum(x1 + rs.uniform(5, 80, n_boxes), w - 1)
        arr[:, 3] = np.minimum(y1 + rs.uniform(5, 80, n_boxes), h - 1)
        arr[:, 4] = rs.uniform(0.1, 1.0, n_boxes)
    return [[arr]]  # [image][class]


@pytest.mark.parametrize("ncur,nprev,seed", [(5, 6, 0), (0, 3, 1), (4, 0, 2)])
def test_detection_iou_gain_matches_reference(ref_ig, ncur, nprev, seed):
    from blockcopy_tpu.tasks.detection.information_gain import (
        build_instance_mask_iou_gain)

    h, w = 128, 256
    cur = _random_bbox_results(seed, ncur, w, h)
    prev = _random_bbox_results(seed + 50, nprev, w, h)

    ref = ref_ig.InformationGainObjectDetection(1)
    with torch.no_grad():
        meta = {"outputs": cur, "outputs_prev": prev,
                "inputs": torch.zeros(1, 3, h, w)}
        want = ref(meta)
        want = want.cpu().numpy() if hasattr(want, "cpu") else np.asarray(want)

    got = build_instance_mask_iou_gain(cur, prev, (1, h, w, 1))
    # layouts: ours NHWC, reference NCHW
    if want.ndim == 4 and want.shape[1] == 1:
        want = want.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_detection_instance_mask_matches_reference(ref_ig):
    from blockcopy_tpu.tasks.detection.information_gain import (
        build_instance_mask)

    h, w = 128, 256
    boxes = _random_bbox_results(3, 7, w, h)
    ref = ref_ig.InformationGainObjectDetection(1)
    with torch.no_grad():
        want = ref.get_output_repr(
            {"outputs": boxes, "inputs": torch.zeros(1, 3, h, w)})
        want = want.cpu().numpy() if hasattr(want, "cpu") else np.asarray(want)
    got = build_instance_mask(boxes, (1, h, w, 1))
    if want.ndim == 4 and want.shape[1] == 1:
        want = want.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
