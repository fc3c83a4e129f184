"""UNet block activation oracles vs hand-built torch modules.

The Inception pattern (``tests/test_inception.py``) applied to the last
untested diffusers-convention surface: ``ResnetBlock2D`` and
``BasicTransformerBlock``/``Transformer2DModel`` activations are compared
against torch blocks built to the published diffusers architecture
(conv padding, GroupNorm eps, attention scale via torch's own fused SDPA,
exact-erf GEGLU, LayerNorm eps). Weight import goes through the real
``unet_key_map`` rules, so the key translation is exercised too.

Reference surface: diffusers blocks reached via
``duwu/trainer/trainer.py:134-136`` and ``duwu/modules/rope_unet.py``.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from torch import nn as tnn

from uwudiff_tpu.models.import_torch import import_params, unet_key_map
from uwudiff_tpu.models.layers import ResnetBlock2D, get_timestep_embedding
from uwudiff_tpu.models.transformer import (
    BasicTransformerBlock,
    Transformer2DModel,
)

ATOL = 2e-5


# --- torch oracles (diffusers-published architecture, built by hand) ---


class TorchResnetBlock2D(tnn.Module):
    def __init__(self, in_c, out_c, temb_c):
        super().__init__()
        self.norm1 = tnn.GroupNorm(32, in_c, eps=1e-5)
        self.conv1 = tnn.Conv2d(in_c, out_c, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb_c, out_c)
        self.norm2 = tnn.GroupNorm(32, out_c, eps=1e-5)
        self.conv2 = tnn.Conv2d(out_c, out_c, 3, padding=1)
        self.conv_shortcut = (
            tnn.Conv2d(in_c, out_c, 1) if in_c != out_c else None
        )

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        res = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return h + res


class TorchAttention(tnn.Module):
    def __init__(self, dim, heads, head_dim, cross_dim=None):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = tnn.Linear(dim, inner, bias=False)
        self.to_k = tnn.Linear(cross_dim or dim, inner, bias=False)
        self.to_v = tnn.Linear(cross_dim or dim, inner, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(inner, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, s, _ = x.shape
        sk = ctx.shape[1]
        q = self.to_q(x).view(b, s, self.heads, self.head_dim).transpose(1, 2)
        k = self.to_k(ctx).view(b, sk, self.heads, self.head_dim).transpose(1, 2)
        v = self.to_v(ctx).view(b, sk, self.heads, self.head_dim).transpose(1, 2)
        # torch's own fused SDPA: the reference's actual attention numerics
        # (duwu/modules/rope_unet.py:151-153)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, s, self.heads * self.head_dim)
        return self.to_out[0](out)


class TorchGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)  # exact erf gelu


class TorchFeedForward(tnn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = tnn.ModuleList(
            [TorchGEGLU(dim, inner), tnn.Dropout(0.0), tnn.Linear(inner, dim)]
        )

    def forward(self, x):
        for mod in self.net:
            x = mod(x)
        return x


class TorchBasicTransformerBlock(tnn.Module):
    def __init__(self, dim, heads, head_dim, cross_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn1 = TorchAttention(dim, heads, head_dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn2 = TorchAttention(dim, heads, head_dim, cross_dim)
        self.norm3 = tnn.LayerNorm(dim, eps=1e-5)
        self.ff = TorchFeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class TorchTransformer2D(tnn.Module):
    def __init__(self, channels, heads, head_dim, cross_dim, linear_proj):
        super().__init__()
        inner = heads * head_dim
        self.norm = tnn.GroupNorm(32, channels, eps=1e-6)
        self.linear_proj = linear_proj
        if linear_proj:
            self.proj_in = tnn.Linear(channels, inner)
            self.proj_out = tnn.Linear(inner, channels)
        else:
            self.proj_in = tnn.Conv2d(channels, inner, 1)
            self.proj_out = tnn.Conv2d(inner, channels, 1)
        self.transformer_blocks = tnn.ModuleList(
            [TorchBasicTransformerBlock(inner, heads, head_dim, cross_dim)]
        )

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        x = self.norm(x)
        if self.linear_proj:
            x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
            x = self.proj_in(x)
        else:
            x = self.proj_in(x)
            x = x.permute(0, 2, 3, 1).reshape(b, h * w, -1)
        for blk in self.transformer_blocks:
            x = blk(x, ctx)
        if self.linear_proj:
            x = self.proj_out(x)
            x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        else:
            x = x.reshape(b, h, w, -1).permute(0, 3, 1, 2)
            x = self.proj_out(x)
        return x + res


def _import_under(flax_params, wrapper_name, torch_module, torch_prefix):
    sd = {
        f"{torch_prefix}{k}": v.detach().numpy()
        for k, v in torch_module.state_dict().items()
    }
    out = import_params(
        {wrapper_name: flax_params}, sd, unet_key_map, strict=True
    )
    return out[wrapper_name]


def _resnet_case(in_c, out_c):
    torch.manual_seed(0)
    oracle = TorchResnetBlock2D(in_c, out_c, temb_c=96).eval()
    ours = ResnetBlock2D(out_channels=out_c, groups=32)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, in_c)).astype(np.float32)
    temb = rng.standard_normal((2, 96)).astype(np.float32)

    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(temb)
    )["params"]
    params = _import_under(
        params, "down_0_res_0", oracle, "down_blocks.0.resnets.0."
    )
    got = np.asarray(
        ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(temb))
    )
    with torch.no_grad():
        ref = oracle(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(temb)
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, atol=ATOL, rtol=1e-4)


def test_resnet_block_matches_torch_oracle():
    _resnet_case(64, 64)  # identity shortcut


def test_resnet_block_channel_change_matches_torch_oracle():
    _resnet_case(64, 128)  # 1x1 conv shortcut


def test_basic_transformer_block_matches_torch_oracle():
    dim, heads, head_dim, cross = 64, 2, 32, 48
    torch.manual_seed(1)
    oracle = TorchBasicTransformerBlock(dim, heads, head_dim, cross).eval()
    ours = BasicTransformerBlock(
        dim=dim, num_heads=heads, head_dim=head_dim, cross_attention_dim=cross
    )

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, dim)).astype(np.float32)
    ctx = rng.standard_normal((2, 7, cross)).astype(np.float32)

    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ctx)
    )["params"]
    params = _import_under(
        {"blocks_0": params},
        "down_0_attn_0",
        oracle,
        "down_blocks.0.attentions.0.transformer_blocks.0.",
    )["blocks_0"]
    got = np.asarray(
        ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(ctx))
    )
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x), torch.from_numpy(ctx)).numpy()
    np.testing.assert_allclose(got, ref, atol=ATOL, rtol=1e-4)


def _transformer2d_case(linear_proj):
    channels, heads, head_dim, cross = 64, 2, 32, 48
    torch.manual_seed(2)
    oracle = TorchTransformer2D(channels, heads, head_dim, cross, linear_proj)
    oracle = oracle.eval()
    ours = Transformer2DModel(
        num_heads=heads,
        head_dim=head_dim,
        num_layers=1,
        cross_attention_dim=cross,
        use_linear_projection=linear_proj,
    )

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4, 4, channels)).astype(np.float32)
    ctx = rng.standard_normal((2, 7, cross)).astype(np.float32)

    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ctx)
    )["params"]
    params = _import_under(
        params, "down_0_attn_0", oracle, "down_blocks.0.attentions.0."
    )
    got = np.asarray(
        ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(ctx))
    )
    with torch.no_grad():
        ref = oracle(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(ctx)
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, atol=ATOL, rtol=1e-4)


def test_transformer2d_conv_projection_matches_torch_oracle():
    _transformer2d_case(linear_proj=False)  # SD1.5 layout


def test_transformer2d_linear_projection_matches_torch_oracle():
    _transformer2d_case(linear_proj=True)  # SDXL layout


def test_fused_qkv_matches_torch_oracle():
    """fused_qkv=True (one [C,3I] self-attn matmul, [Ck,2I] cross k/v —
    the MFU lever) must be numerically identical to the separate
    projections; the importer concatenates the diffusers tensors."""
    dim, heads, head_dim, cross = 64, 2, 32, 48
    torch.manual_seed(4)
    oracle = TorchBasicTransformerBlock(dim, heads, head_dim, cross).eval()
    fused = BasicTransformerBlock(
        dim=dim, num_heads=heads, head_dim=head_dim,
        cross_attention_dim=cross, fused_qkv=True,
    )

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 16, dim)).astype(np.float32)
    ctx = rng.standard_normal((2, 7, cross)).astype(np.float32)

    params = fused.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ctx)
    )["params"]
    assert "to_qkv" in params["attn1"] and "to_kv" in params["attn2"]
    params = _import_under(
        {"blocks_0": params},
        "down_0_attn_0",
        oracle,
        "down_blocks.0.attentions.0.transformer_blocks.0.",
    )["blocks_0"]
    got = np.asarray(
        fused.apply({"params": params}, jnp.asarray(x), jnp.asarray(ctx))
    )
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x), torch.from_numpy(ctx)).numpy()
    np.testing.assert_allclose(got, ref, atol=ATOL, rtol=1e-4)


def test_timestep_embedding_closed_form():
    """flip_sin_to_cos ordering + frequency ladder, checked against the
    closed form cos/sin(t * max_period^(-i/half)) — no transcription on
    the oracle side at all."""
    t = np.array([0.0, 1.0, 500.0, 999.0], dtype=np.float32)
    dim = 32
    emb = np.asarray(get_timestep_embedding(jnp.asarray(t), dim))
    half = dim // 2
    freqs = np.exp(-math.log(10000) * np.arange(half) / half)
    np.testing.assert_allclose(
        emb[:, :half], np.cos(t[:, None] * freqs[None]), atol=1e-5
    )
    np.testing.assert_allclose(
        emb[:, half:], np.sin(t[:, None] * freqs[None]), atol=1e-5
    )
