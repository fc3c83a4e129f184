"""Inception-v3 FID tower: torch parity + import coverage.

Block-level numerics are checked against freshly-built torch modules
(conv+BatchNorm eval semantics, asymmetric-kernel padding, avg-pool
denominator conventions, branch concat order) — the exact surfaces a
rule-based weight translator can silently get wrong.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from uwudiff_tpu.models.import_torch import import_params, inception_key_map
from uwudiff_tpu.models.inception import (
    BasicConv2d,
    InceptionA,
    InceptionC,
    InceptionE,
    InceptionV3Features,
)


def _torch_basic_conv(cin, cout, kernel, stride=1, padding=0):
    conv = tnn.Conv2d(cin, cout, kernel, stride=stride, padding=padding, bias=False)
    bn = tnn.BatchNorm2d(cout, eps=1e-3)
    # randomize running stats so BN import is actually exercised
    with torch.no_grad():
        bn.running_mean.normal_(0, 0.5)
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.normal_(1.0, 0.2)
        bn.bias.normal_(0, 0.2)
    mod = tnn.Sequential()
    mod.conv = conv
    mod.bn = bn
    return mod


def _run_torch_basic(mod, x_nchw):
    with torch.no_grad():
        return F.relu(mod.bn.eval()(mod.conv(x_nchw)))


def _to_jax(x_nchw):
    return jnp.asarray(x_nchw.numpy().transpose(0, 2, 3, 1))


def _from_jax(y_nhwc):
    return np.asarray(y_nhwc).transpose(0, 3, 1, 2)


def _import_from_torch_module(flax_model, torch_module, example):
    params = flax_model.init(jax.random.PRNGKey(0), example)["params"]
    sd = {k: v.detach().numpy() for k, v in torch_module.state_dict().items()}
    sd = {k: v for k, v in sd.items() if "num_batches_tracked" not in k}
    return import_params(params, sd, inception_key_map, strict=True)


def test_basic_conv2d_matches_torch():
    torch.manual_seed(0)
    mod = _torch_basic_conv(3, 8, 3, stride=2)
    x = torch.randn(2, 3, 17, 17)
    ref = _run_torch_basic(mod, x)

    flax_mod = BasicConv2d(8, (3, 3), strides=(2, 2))
    xj = _to_jax(x)
    params = _import_from_torch_module(flax_mod, mod, xj)
    got = flax_mod.apply({"params": params}, xj)
    np.testing.assert_allclose(_from_jax(got), ref.numpy(), atol=2e-5)


class _TorchInceptionA(tnn.Module):
    def __init__(self, cin, pool_features, count_include_pad):
        super().__init__()
        self.cip = count_include_pad
        self.branch1x1 = _torch_basic_conv(cin, 64, 1)
        self.branch5x5_1 = _torch_basic_conv(cin, 48, 1)
        self.branch5x5_2 = _torch_basic_conv(48, 64, 5, padding=2)
        self.branch3x3dbl_1 = _torch_basic_conv(cin, 64, 1)
        self.branch3x3dbl_2 = _torch_basic_conv(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = _torch_basic_conv(96, 96, 3, padding=1)
        self.branch_pool = _torch_basic_conv(cin, pool_features, 1)

    def forward(self, x):
        b1 = _run_torch_basic(self.branch1x1, x)
        b5 = _run_torch_basic(
            self.branch5x5_2, _run_torch_basic(self.branch5x5_1, x)
        )
        bd = _run_torch_basic(self.branch3x3dbl_1, x)
        bd = _run_torch_basic(self.branch3x3dbl_2, bd)
        bd = _run_torch_basic(self.branch3x3dbl_3, bd)
        bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=self.cip)
        bp = _run_torch_basic(self.branch_pool, bp)
        return torch.cat([b1, b5, bd, bp], dim=1)


@pytest.mark.parametrize("cip", [True, False])
def test_inception_a_matches_torch(cip):
    torch.manual_seed(1)
    mod = _TorchInceptionA(16, 32, count_include_pad=cip)
    x = torch.randn(1, 16, 13, 13)
    with torch.no_grad():
        ref = mod(x)

    flax_mod = InceptionA(32, count_include_pad=cip)
    xj = _to_jax(x)
    params = _import_from_torch_module(flax_mod, mod, xj)
    got = flax_mod.apply({"params": params}, xj)
    np.testing.assert_allclose(_from_jax(got), ref.numpy(), atol=2e-5)


class _TorchInceptionC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = _torch_basic_conv(cin, 192, 1)
        self.branch7x7_1 = _torch_basic_conv(cin, c7, 1)
        self.branch7x7_2 = _torch_basic_conv(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7_3 = _torch_basic_conv(c7, 192, (7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _torch_basic_conv(cin, c7, 1)
        self.branch7x7dbl_2 = _torch_basic_conv(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _torch_basic_conv(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _torch_basic_conv(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _torch_basic_conv(c7, 192, (1, 7), padding=(0, 3))
        self.branch_pool = _torch_basic_conv(cin, 192, 1)

    def forward(self, x):
        b1 = _run_torch_basic(self.branch1x1, x)
        b7 = x
        for m in (self.branch7x7_1, self.branch7x7_2, self.branch7x7_3):
            b7 = _run_torch_basic(m, b7)
        bd = x
        for m in (
            self.branch7x7dbl_1,
            self.branch7x7dbl_2,
            self.branch7x7dbl_3,
            self.branch7x7dbl_4,
            self.branch7x7dbl_5,
        ):
            bd = _run_torch_basic(m, bd)
        bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)
        bp = _run_torch_basic(self.branch_pool, bp)
        return torch.cat([b1, b7, bd, bp], dim=1)


def test_inception_c_asymmetric_kernels_match_torch():
    torch.manual_seed(2)
    mod = _TorchInceptionC(24, 16)
    x = torch.randn(1, 24, 9, 9)
    with torch.no_grad():
        ref = mod(x)

    flax_mod = InceptionC(16, count_include_pad=False)
    xj = _to_jax(x)
    params = _import_from_torch_module(flax_mod, mod, xj)
    got = flax_mod.apply({"params": params}, xj)
    np.testing.assert_allclose(_from_jax(got), ref.numpy(), atol=2e-5)


class _TorchInceptionE(tnn.Module):
    def __init__(self, cin, pool_kind):
        super().__init__()
        self.pool_kind = pool_kind
        self.branch1x1 = _torch_basic_conv(cin, 320, 1)
        self.branch3x3_1 = _torch_basic_conv(cin, 384, 1)
        self.branch3x3_2a = _torch_basic_conv(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3_2b = _torch_basic_conv(384, 384, (3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _torch_basic_conv(cin, 448, 1)
        self.branch3x3dbl_2 = _torch_basic_conv(448, 384, 3, padding=1)
        self.branch3x3dbl_3a = _torch_basic_conv(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = _torch_basic_conv(384, 384, (3, 1), padding=(1, 0))
        self.branch_pool = _torch_basic_conv(cin, 192, 1)

    def forward(self, x):
        b1 = _run_torch_basic(self.branch1x1, x)
        b3 = _run_torch_basic(self.branch3x3_1, x)
        b3 = torch.cat(
            [_run_torch_basic(self.branch3x3_2a, b3),
             _run_torch_basic(self.branch3x3_2b, b3)],
            dim=1,
        )
        bd = _run_torch_basic(self.branch3x3dbl_1, x)
        bd = _run_torch_basic(self.branch3x3dbl_2, bd)
        bd = torch.cat(
            [_run_torch_basic(self.branch3x3dbl_3a, bd),
             _run_torch_basic(self.branch3x3dbl_3b, bd)],
            dim=1,
        )
        if self.pool_kind == "max":
            bp = F.max_pool2d(x, 3, 1, 1)
        else:
            bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)
        bp = _run_torch_basic(self.branch_pool, bp)
        return torch.cat([b1, b3, bd, bp], dim=1)


@pytest.mark.parametrize("pool_kind", ["avg", "max"])
def test_inception_e_matches_torch(pool_kind):
    torch.manual_seed(3)
    mod = _TorchInceptionE(32, pool_kind)
    x = torch.randn(1, 32, 7, 7)
    with torch.no_grad():
        ref = mod(x)

    flax_mod = InceptionE(count_include_pad=False, pool_kind=pool_kind)
    xj = _to_jax(x)
    params = _import_from_torch_module(flax_mod, mod, xj)
    got = flax_mod.apply({"params": params}, xj)
    np.testing.assert_allclose(_from_jax(got), ref.numpy(), atol=2e-5)


def test_full_tower_key_map_covers_every_param():
    """Every param of the full tower maps to a distinct torch key in the
    torchvision/torch-fidelity namespace, and a synthetic state dict
    with exactly those keys imports 100% (strict) with shape checks."""
    model = InceptionV3Features()
    params = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 299, 299, 3))),
        jax.random.PRNGKey(0),
    )["params"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    keys = set()
    sd = {}
    rng = np.random.default_rng(0)
    for path, leaf in flat:
        our = "/".join(str(getattr(p, "key", p)) for p in path)
        torch_key, tr = inception_key_map(our)
        assert torch_key not in keys, f"duplicate mapping {torch_key}"
        keys.add(torch_key)
        shape = leaf.shape
        if torch_key.endswith("conv.weight"):  # invert HWIO <- OIHW
            shape = (shape[3], shape[2], shape[0], shape[1])
        sd[torch_key] = rng.standard_normal(shape).astype(np.float32)
    # spot-check canonical torchvision key names exist
    for expected in (
        "Conv2d_1a_3x3.conv.weight",
        "Conv2d_1a_3x3.bn.running_mean",
        "Mixed_5b.branch5x5_2.conv.weight",
        "Mixed_6b.branch7x7dbl_5.bn.running_var",
        "Mixed_7c.branch3x3dbl_3b.conv.weight",
    ):
        assert expected in sd, expected

    real = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params
    )
    imported = import_params(real, sd, inception_key_map, strict=True)
    # a couple of leaves actually changed (not left at zeros)
    leaf = imported["Conv2d_1a_3x3"]["conv"]["kernel"]
    assert float(jnp.abs(leaf).sum()) > 0


def test_feature_shape_and_determinism():
    from uwudiff_tpu.metrics.features import inception_features

    fn = inception_features()  # deterministic random-init tower
    imgs = np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)).astype(
        np.float32
    )
    f1 = np.asarray(fn(jnp.asarray(imgs)))
    f2 = np.asarray(fn(jnp.asarray(imgs)))
    assert f1.shape == (2, 2048)
    np.testing.assert_array_equal(f1, f2)
