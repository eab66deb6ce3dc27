"""Numerics parity against torch (CPU): pins our layer semantics to the
reference's PyTorch operators, so converted checkpoints behave identically.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from blockcopy_tpu.core.blocked import ExecCtx
from blockcopy_tpu.ops import layers as L


def rand(shape, seed=0, scale=1.0):
    return (np.random.RandomState(seed).randn(*shape) * scale).astype(
        np.float32)


class TestConvParity:
    @pytest.mark.parametrize("k,stride,dilation,pad", [
        (3, 1, 1, 1), (7, 2, 1, 3), (3, 1, 2, 2), (1, 1, 1, 0), (3, 2, 1, 1),
    ])
    def test_conv2d(self, k, stride, dilation, pad):
        x = rand((2, 16, 24, 5), 1)
        w = rand((k, k, 5, 7), 2, 0.2)
        b = rand((7,), 3, 0.1)
        ours = np.asarray(L.conv2d(ExecCtx.dense(), "c", jnp.asarray(x),
                                   jnp.asarray(w), jnp.asarray(b),
                                   stride=stride, dilation=dilation,
                                   padding=pad))
        ref = torch.nn.functional.conv2d(
            torch.tensor(x.transpose(0, 3, 1, 2)),
            torch.tensor(w.transpose(3, 2, 0, 1)),
            torch.tensor(b), stride=stride, padding=pad, dilation=dilation,
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_bn_eval_fold(self):
        c = 6
        x = rand((1, 8, 8, c), 4)
        gamma = rand((c,), 5, 0.3) + 1
        beta = rand((c,), 6)
        mean = rand((c,), 7)
        var = np.abs(rand((c,), 8)) + 0.5
        scale = gamma / np.sqrt(var + 1e-5)
        bias = beta - mean * scale
        ours = np.asarray(L.batch_norm(jnp.asarray(x), jnp.asarray(scale),
                                       jnp.asarray(bias)))
        ref = torch.nn.functional.batch_norm(
            torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(mean),
            torch.tensor(var), torch.tensor(gamma), torch.tensor(beta),
            training=False, eps=1e-5,
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_max_pool(self):
        x = rand((1, 17, 23, 4), 9)
        ours = np.asarray(L.max_pool2d(ExecCtx.dense(), "p", jnp.asarray(x),
                                       kernel=3, stride=2, padding=1))
        ref = torch.nn.functional.max_pool2d(
            torch.tensor(x.transpose(0, 3, 1, 2)), 3, 2, 1,
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)

    def test_group_norm(self):
        x = rand((2, 8, 8, 8), 10)
        gamma = rand((8,), 11, 0.2) + 1
        beta = rand((8,), 12)
        ours = np.asarray(L.group_norm(jnp.asarray(x), 4, jnp.asarray(gamma),
                                       jnp.asarray(beta)))
        ref = torch.nn.functional.group_norm(
            torch.tensor(x.transpose(0, 3, 1, 2)), 4, torch.tensor(gamma),
            torch.tensor(beta), eps=1e-5,
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_bilinear_resize_matches_torch_interpolate(self):
        x = rand((1, 8, 12, 3), 13)
        ours = np.asarray(L.resize_bilinear(jnp.asarray(x), (16, 24)))
        ref = torch.nn.functional.interpolate(
            torch.tensor(x.transpose(0, 3, 1, 2)), size=(16, 24),
            mode="bilinear", align_corners=False,
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_avg_pool(self):
        x = rand((1, 8, 8, 3), 14)
        ours = np.asarray(L.avg_pool2d(jnp.asarray(x), 2))
        ref = torch.nn.functional.avg_pool2d(
            torch.tensor(x.transpose(0, 3, 1, 2)), 2,
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


class TestRMSpropParity:
    @pytest.mark.parametrize("momentum", [0.0, 0.5])
    def test_matches_torch(self, momentum):
        from blockcopy_tpu.policy import optim as rmsprop

        p0 = rand((4, 3), 20)
        params = {"w": jnp.asarray(p0)}
        state = rmsprop.init(params)

        tp = torch.nn.Parameter(torch.tensor(p0.copy()))
        topt = torch.optim.RMSprop([tp], lr=1e-2, weight_decay=1e-3,
                                   momentum=momentum, centered=False)
        for step in range(5):
            g = rand((4, 3), 21 + step, 0.5)
            params, state = rmsprop.update(
                {"w": jnp.asarray(g)}, state, params, lr=1e-2,
                weight_decay=1e-3, momentum=momentum,
            )
            tp.grad = torch.tensor(g.copy())
            topt.step()
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tp.detach().numpy(), rtol=1e-5, atol=1e-6)


class TestKLParity:
    def test_kl_matches_torch(self):
        from blockcopy_tpu.policy.information_gain import (
            semseg_information_gain,
        )
        cur = rand((1, 16, 16, 7), 30)
        prev = rand((1, 16, 16, 7), 31)
        ours = np.asarray(semseg_information_gain(jnp.asarray(cur),
                                                  jnp.asarray(prev)))
        tc = torch.tensor(cur.transpose(0, 3, 1, 2))
        tp = torch.tensor(prev.transpose(0, 3, 1, 2))
        tc4 = torch.nn.functional.interpolate(tc, scale_factor=0.25,
                                              mode="bilinear")
        tp4 = torch.nn.functional.interpolate(tp, scale_factor=0.25,
                                              mode="bilinear")
        kl = torch.nn.functional.kl_div(
            input=torch.nn.functional.log_softmax(tc4, dim=1),
            target=torch.nn.functional.log_softmax(tp4, dim=1),
            reduction="none", log_target=True,
        ).mean(1, keepdim=True).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, kl, rtol=1e-3, atol=1e-5)