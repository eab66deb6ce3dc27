"""Checkpoint conversion, metrics, flops accounting, and the CLI driver."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blockcopy_tpu.models.swiftnet import SwiftNetConfig, init_swiftnet
from blockcopy_tpu.utils import checkpoint as ckpt
from blockcopy_tpu.utils.flops import FlopsTracker, policy_net_macs
from blockcopy_tpu.utils.metrics import AverageMeter, StreamSegMetrics

CFG18 = SwiftNetConfig(backbone="resnet18", num_classes=19)


def fake_torch_sd(cfg):
    """Generate a torch-style SwiftNet state_dict with correct keys/shapes."""
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

    def bnrc(prefix, cin, cout, k, bias=True, batch_norm=True):
        if batch_norm:
            bn(prefix + ".norm", cin)
        conv(prefix + ".conv", cout, cin, k, bias=bias)

    conv("backbone.conv1", 64, 3, 7)
    bn("backbone.bn1", 64)
    cin = 64
    for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512),
                                                 cfg.resnet.layers)):
        for b in range(blocks):
            pre = f"backbone.layer{stage + 1}.{b}"
            stride = 1 if stage == 0 or b > 0 else 2
            conv(pre + ".conv1", planes, cin, 3)
            bn(pre + ".bn1", planes)
            conv(pre + ".conv2", planes, planes, 3)
            bn(pre + ".bn2", planes)
            if b == 0 and (stride != 1 or cin != planes):
                conv(pre + ".downsample.0", planes, cin, 1)
                bn(pre + ".downsample.1", planes)
            cin = planes
    nf = cfg.num_features
    level = nf // cfg.spp_levels
    bnrc("spp.spp.spp_bn", 512, nf, 1, bias=False)
    for i in range(cfg.spp_levels):
        bnrc(f"spp.spp.spp{i}", nf, level, 1, bias=False)
    bnrc("spp.spp.spp_fuse", nf + cfg.spp_levels * level, nf, 1, bias=False)
    for i, skip in enumerate([256, 128, 64]):
        bnrc(f"upsample.{i}.bottleneck", skip, nf, 1, bias=False)
        bnrc(f"upsample.{i}.blend_conv", nf, nf, 3, bias=False)
    bnrc("logits", nf, cfg.num_classes, 1, bias=True)
    return sd


class TestTorchConversion:
    def test_structure_matches_init(self):
        sd = fake_torch_sd(CFG18)
        params = ckpt.convert_swiftnet_state_dict(sd, CFG18)
        ref = init_swiftnet(jax.random.PRNGKey(0), CFG18)
        ref_flat = ckpt._flatten(ref)
        got_flat = ckpt._flatten(params)
        assert set(ref_flat) == set(got_flat), (
            set(ref_flat) ^ set(got_flat)
        )
        for k in ref_flat:
            assert ref_flat[k].shape == got_flat[k].shape, k

    def test_conv_transpose_and_bn_fold(self):
        sd = fake_torch_sd(CFG18)
        params = ckpt.convert_swiftnet_state_dict(sd, CFG18)
        w_t = sd["backbone.conv1.weight"]  # OIHW
        np.testing.assert_array_equal(
            np.asarray(params["backbone"]["conv1"]["w"]),
            w_t.transpose(2, 3, 1, 0),
        )
        g = sd["backbone.bn1.weight"]
        b = sd["backbone.bn1.bias"]
        m = sd["backbone.bn1.running_mean"]
        v = sd["backbone.bn1.running_var"]
        scale = np.asarray(params["backbone"]["bn1"]["scale"])
        bias = np.asarray(params["backbone"]["bn1"]["bias"])
        x = np.random.RandomState(1).randn(100, 64).astype(np.float32)
        torch_bn = (x - m) / np.sqrt(v + 1e-5) * g + b
        np.testing.assert_allclose(x * scale + bias, torch_bn, rtol=1e-5,
                                   atol=1e-5)

    def test_npz_roundtrip(self, tmp_path):
        params = init_swiftnet(jax.random.PRNGKey(0), CFG18)
        p = str(tmp_path / "params.npz")
        ckpt.save_params(p, params)
        loaded = ckpt.load_npz(p, params)
        fa, fb = ckpt._flatten(params), ckpt._flatten(loaded)
        for k in fa:
            np.testing.assert_array_equal(fa[k], fb[k])


class TestMetrics:
    def test_perfect_prediction_miou_1(self):
        m = StreamSegMetrics(3)
        y = np.random.RandomState(0).randint(0, 3, (2, 10, 10))
        m.update(y, y)
        assert m.get_results()["Mean IoU"] == pytest.approx(1.0)

    def test_ignore_label_excluded(self):
        m = StreamSegMetrics(3)
        y = np.full((1, 4, 4), 255)
        p = np.zeros((1, 4, 4), int)
        m.update(y, p)
        assert m.confusion_matrix.sum() == 0

    def test_average_meter(self):
        a = AverageMeter()
        a.update("x", 1.0)
        a.update("x", 3.0)
        assert a.get_results("x") == 2.0


class TestFlops:
    def test_tracker_average(self):
        t = FlopsTracker(policy_macs_per_frame=10.0)
        t.record_trace(4, 100.0)
        t.record_trace(8, 200.0)
        t.record_frame(8, policy_ran=False)   # first frame
        t.record_frame(4, policy_ran=True)
        t.record_frame(0, policy_ran=True)    # copy-only frame
        assert t.average_macs() == pytest.approx((200 + 100 + 0 + 20) / 3)

    def test_policy_macs_positive_and_scales(self):
        m1 = policy_net_macs(256, 512, 19)
        m2 = policy_net_macs(512, 1024, 19)
        assert m1 > 0 and 3.5 < m2 / m1 < 4.5


class TestCLI:
    def test_synthetic_end_to_end(self, capsys):
        from blockcopy_tpu.tasks.semseg import eval as cli
        results = cli.main([
            "--synthetic", "--res", "256", "--clip-length", "3",
            "--num-clips-warmup", "1", "--num-clips-eval", "1",
            "--block-policy", "none", "--model-checkpoint", "",
        ])
        assert "fps" in results and results["fps"] > 0
        assert "Mean IoU" in results
        assert results["gmacs_per_image"] > 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        json.loads(out)

    def test_synthetic_rl_policy(self):
        from blockcopy_tpu.tasks.semseg import eval as cli
        results = cli.main([
            "--synthetic", "--res", "256", "--clip-length", "4",
            "--num-clips-warmup", "1", "--num-clips-eval", "1",
            "--block-policy", "rl_semseg", "--model-checkpoint", "",
        ])
        assert 0.0 < results["perc_exec"] <= 1.0
        assert results["gmacs_per_image"] > 0

    def test_synthetic_half_precision(self):
        """--half end-to-end (bf16 params/frames, fp32 metrics): the bench
        runs bf16, so the CLI path deserves the same coverage."""
        from blockcopy_tpu.tasks.semseg import eval as cli
        results = cli.main([
            "--synthetic", "--res", "256", "--clip-length", "3",
            "--num-clips-warmup", "1", "--num-clips-eval", "1",
            "--block-policy", "rl_semseg", "--model-checkpoint", "",
            "--half", "--speed-mode",
        ])
        assert results["fps"] > 0
        assert np.isfinite(results["running_cost"])


class TestOrbax:
    def test_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from blockcopy_tpu.utils.checkpoint import load_orbax, save_orbax

        tree = {"a": jnp.arange(10.0), "b": {"c": jnp.ones((3, 4))}}
        p = str(tmp_path / "ckpt")
        save_orbax(p, tree)
        back = load_orbax(p, jax.tree.map(jnp.zeros_like, tree))
        np.testing.assert_array_equal(np.asarray(back["a"]),
                                      np.arange(10.0))
        np.testing.assert_array_equal(np.asarray(back["b"]["c"]),
                                      np.ones((3, 4)))


def test_npz_extensionless_path_roundtrip(tmp_path):
    """np.savez appends '.npz' to extensionless paths; load_npz must mirror
    that so save_params/load_npz round-trip on the same path string."""
    p = str(tmp_path / "policy")  # no extension
    tree = {"a": jnp.arange(4.0)}
    ckpt.save_params(p, tree)
    assert os.path.exists(p + ".npz")
    loaded = ckpt.load_npz(p, tree)
    np.testing.assert_array_equal(np.asarray(loaded["a"]),
                                  np.asarray(tree["a"]))


def test_shipped_shell_configs_parse():
    """Every shipped .sh config's flag line must parse against the current
    CLI parser (catches flag drift between configs/ and core/argparser)."""
    import glob
    import shlex

    from blockcopy_tpu.tasks.semseg.eval import build_argparser

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "configs", "swiftnet_*",
                                          "*.sh")))
    assert len(files) == 12, files
    for f in files:
        text = open(f).read().replace("\\\n", " ")
        line = next(ln for ln in text.splitlines()
                    if "blockcopy_tpu.tasks.semseg.eval" in ln)
        toks = shlex.split(line)
        args = toks[toks.index("blockcopy_tpu.tasks.semseg.eval") + 1:]
        ns = build_argparser().parse_args(args)
        assert ns.block_size == 128, f
        assert ns.model_backbone in ("resnet18", "resnet50"), f
