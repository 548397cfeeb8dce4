"""Pin core/torch_convert layer rules against torch layers directly.

The per-model converter tests are round-trips (flax -> torch-layout ->
flax), which prove invertibility but not torch semantics. These tests run
the actual torch layer and the flax layer carrying converted weights on
the same input and require numerical agreement — this is what caught the
missing spatial kernel flip in ``conv_transpose`` (flax ``nn.ConvTranspose``
with ``transpose_kernel=False`` is a fractionally-strided correlation,
torch ``ConvTranspose2d`` is the gradient of conv).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax.linen as fnn
import jax.numpy as jnp

from soar_tpu.core import torch_convert as tc


def _np(t):
    return t.detach().cpu().numpy()


def test_linear_matches_torch():
    torch.manual_seed(0)
    m = torch.nn.Linear(5, 3)
    sd = {f"l.{k}": v for k, v in m.state_dict().items()}
    x = torch.randn(4, 5)
    want = _np(m(x))
    leaf = tc.lin(sd, "l")
    got = np.asarray(x.numpy() @ leaf["kernel"] + leaf["bias"])
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("stride,pad", [(1, 1), (2, 1)])
def test_conv2d_matches_torch(stride, pad):
    torch.manual_seed(1)
    m = torch.nn.Conv2d(4, 6, 3, stride=stride, padding=pad)
    sd = {f"c.{k}": v for k, v in m.state_dict().items()}
    x = torch.randn(2, 4, 8, 8)
    want = _np(m(x)).transpose(0, 2, 3, 1)
    fl = fnn.Conv(6, (3, 3), strides=(stride, stride), padding=pad)
    leaf = {k: jnp.asarray(v) for k, v in tc.conv(sd, "c").items()}
    got = np.asarray(fl.apply({"params": leaf}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv_transpose_2x2_s2_matches_torch():
    # SAM mask-decoder upscaling layout (k=2, s=2, p=0).
    torch.manual_seed(2)
    m = torch.nn.ConvTranspose2d(4, 2, 2, stride=2)
    sd = {f"t.{k}": v for k, v in m.state_dict().items()}
    x = torch.randn(1, 4, 5, 5)
    want = _np(m(x)).transpose(0, 2, 3, 1)
    fl = fnn.ConvTranspose(2, (2, 2), strides=(2, 2))
    leaf = {k: jnp.asarray(v) for k, v in tc.conv_transpose(sd, "t").items()}
    got = np.asarray(fl.apply({"params": leaf}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv_transpose_3x3_s2_op1_matches_torch():
    # pix2pixHD GlobalGenerator upsample layout (k=3, s=2, p=1, op=1):
    # flax padding ((1, 2), (1, 2)) = (k-1-p, k-1-p+op).
    torch.manual_seed(3)
    m = torch.nn.ConvTranspose2d(6, 3, 3, stride=2, padding=1, output_padding=1)
    sd = {f"t.{k}": v for k, v in m.state_dict().items()}
    x = torch.randn(2, 6, 7, 7)
    want = _np(m(x)).transpose(0, 2, 3, 1)
    fl = fnn.ConvTranspose(3, (3, 3), strides=(2, 2), padding=((1, 2), (1, 2)))
    leaf = {k: jnp.asarray(v) for k, v in tc.conv_transpose(sd, "t").items()}
    got = np.asarray(fl.apply({"params": leaf}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_normalnet_convtranspose_shape_and_apply():
    # The ECON GlobalGenerator up layers have in = 2*out; the converted
    # kernel must land in flax's (kH, kW, in, out) slot (a wrong transpose
    # order crashes apply with a ScopeParamShapeError).
    torch.manual_seed(4)
    m = torch.nn.ConvTranspose2d(8, 4, 3, stride=2, padding=1, output_padding=1)
    sd = {f"t.{k}": v for k, v in m.state_dict().items()}
    leaf = tc.conv_transpose(sd, "t")
    assert leaf["kernel"].shape == (3, 3, 8, 4)
    x = torch.randn(1, 8, 6, 6)
    want = _np(m(x)).transpose(0, 2, 3, 1)
    fl = fnn.ConvTranspose(4, (3, 3), strides=(2, 2), padding=((1, 2), (1, 2)))
    got = np.asarray(
        fl.apply(
            {"params": {k: jnp.asarray(v) for k, v in leaf.items()}},
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
