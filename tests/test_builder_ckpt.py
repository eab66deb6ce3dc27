"""Config-driven detector construction and CSP torch-checkpoint conversion."""

import jax
import numpy as np
import pytest

from blockcopy_tpu.models.builder import build_detector, csp_config_from_dict
from blockcopy_tpu.models.csp import CSPConfig, init_csp
from blockcopy_tpu.tasks.detection.checkpoint import convert_csp_state_dict
from blockcopy_tpu.utils.checkpoint import _flatten
from blockcopy_tpu.utils.registry import load_config


class TestBuilder:
    def test_shipped_config_builds(self):
        cfg = load_config("configs/csp/csp_r50_clip_blockcopy_030.py")
        model = build_detector(cfg)
        assert model.cfg.num_classes == 2
        assert model.cfg.strides == (1, 2, 2, 1)
        assert model.cfg.dilations == (1, 1, 1, 2)
        assert model.settings["block_target"] == 0.3
        assert model.policy.block_target == 0.3

    def test_csp_config_from_dict_test_cfg(self):
        cfg = load_config("configs/csp/csp_r50_clip_blockcopy_030.py")
        c = csp_config_from_dict(cfg)
        assert c.nms_pre == 1000 and c.score_thr == 0.1
        assert c.nms_iou == 0.5 and c.max_per_img == 100


def fake_csp_torch_sd(cfg: CSPConfig):
    """Torch-style Pedestron CSP state_dict with correct keys/shapes."""
    rs = np.random.RandomState(0)
    sd = {}

    def conv(key, cout, cin, k, bias=False):
        sd[key + ".weight"] = rs.randn(cout, cin, k, k).astype(np.float32)
        if bias:
            sd[key + ".bias"] = rs.randn(cout).astype(np.float32)

    def bn(key, c):
        sd[key + ".weight"] = rs.rand(c).astype(np.float32) + 0.5
        sd[key + ".bias"] = rs.randn(c).astype(np.float32)
        sd[key + ".running_mean"] = rs.randn(c).astype(np.float32)
        sd[key + ".running_var"] = rs.rand(c).astype(np.float32) + 0.5

    conv("backbone.conv1", 64, 3, 7)
    bn("backbone.bn1", 64)
    cin = 64
    for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512),
                                                 cfg.stage_blocks)):
        for b in range(blocks):
            pre = f"backbone.layer{stage + 1}.{b}"
            conv(pre + ".conv1", planes, cin, 1)
            bn(pre + ".bn1", planes)
            conv(pre + ".conv2", planes, planes, 3)
            bn(pre + ".bn2", planes)
            conv(pre + ".conv3", planes * 4, planes, 1)
            bn(pre + ".bn3", planes * 4)
            if b == 0:
                conv(pre + ".downsample.0", planes * 4, cin, 1)
                bn(pre + ".downsample.1", planes * 4)
            cin = planes * 4
    for p, cin_n in [("p3", 512), ("p4", 1024), ("p5", 2048)]:
        # ConvTranspose2d weight: (cin, cout, k, k)
        sd[f"neck.{p}.weight"] = rs.randn(cin_n, 256, 4, 4).astype(np.float32)
        sd[f"neck.{p}.bias"] = rs.randn(256).astype(np.float32)
        sd[f"neck.{p}_l2.weight"] = rs.rand(256).astype(np.float32) * 10
    for branch in ("cls", "reg", "offset"):
        for i in range(cfg.stacked_convs):
            chn = 768 if i == 0 else 256
            pre = f"bbox_head.{branch}_convs.{i}"
            conv(pre + ".conv", 256, chn, 3)
            sd[pre + ".gn.weight"] = rs.rand(256).astype(np.float32) + 0.5
            sd[pre + ".gn.bias"] = rs.randn(256).astype(np.float32)
    conv("bbox_head.csp_cls", cfg.cls_out_channels, 256, 3, bias=True)
    conv("bbox_head.csp_reg", 1, 256, 3, bias=True)
    conv("bbox_head.csp_offset", 2, 256, 3, bias=True)
    sd["bbox_head.reg_scales.0.scale"] = np.float32(1.0)
    sd["bbox_head.offset_scales.0.scale"] = np.float32(1.0)
    return sd


class TestCSPConversion:
    def test_structure_matches_init(self):
        cfg = CSPConfig()
        sd = fake_csp_torch_sd(cfg)
        params = convert_csp_state_dict(sd, cfg)
        ref = init_csp(jax.random.PRNGKey(0), cfg)
        fa, fb = _flatten(ref), _flatten(params)
        assert set(fa) == set(fb), sorted(set(fa) ^ set(fb))[:8]
        for k in fa:
            assert fa[k].shape == fb[k].shape, (k, fa[k].shape, fb[k].shape)

    def test_convT_weight_layout(self):
        cfg = CSPConfig()
        sd = fake_csp_torch_sd(cfg)
        params = convert_csp_state_dict(sd, cfg)
        w_t = sd["neck.p3.weight"]  # (cin, cout, kh, kw)
        np.testing.assert_array_equal(
            np.asarray(params["neck"]["p3"]["w"]),
            w_t.transpose(2, 3, 0, 1),
        )


class TestBuilderRegressions:
    def test_backbone_depth_maps_to_stage_blocks(self):
        cfg = {"model": {"type": "CSPBlockCopy",
                         "backbone": {"type": "ResNet", "depth": 101}}}
        c = csp_config_from_dict(cfg)
        assert c.depth == 101 and c.stage_blocks == (3, 4, 23, 3)
        with pytest.raises(ValueError, match="depth"):
            csp_config_from_dict(
                {"model": {"backbone": {"depth": 18}}})

    def test_settings_override_beats_config(self):
        cfg = load_config("configs/csp/csp_r50_clip_blockcopy_030.py")
        det = build_detector(cfg, settings_override={"block_target": 0.77})
        assert det.settings["block_target"] == 0.77
