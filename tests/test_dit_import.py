"""DiT checkpoint import/export vs a faithful torch transcription of
the public facebookresearch/DiT model (the released DiT-XL/2-class
ImageNet checkpoints' exact state-dict layout and forward semantics —
transcribed here as an independent oracle, the `tests/test_inception.py`
/ `tests/test_block_oracles.py` pattern).

Covers the conventions a silent mismatch would corrupt:
- timestep embedding (cos-first halves, 10000^{-i/half} frequencies)
- the MAE 2D sin-cos pos-embed quirk (w-coords feed the FIRST half)
- fused qkv split (rows [q; k; v] -> separate q/k/v kernels)
- adaLN-Zero chunk order (shift, scale, gate) x (attn, mlp)
- tanh-approx GELU in the MLP, eps=1e-6 no-affine LayerNorms
- unpatchify channel ordering
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from uwudiff_tpu.models.dit import DiT, _2d_sincos_pos_embed  # noqa: E402
from uwudiff_tpu.models.import_torch import (  # noqa: E402
    dit_key_map,
    export_params,
    import_params,
)

D, HEADS, DEPTH, P, IN_CH, NCLS = 32, 2, 2, 2, 4, 10


def torch_timestep_embedding(t, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period)
        * torch.arange(half, dtype=torch.float32)
        / half
    )
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def torch_pos_embed(dim, gh, gw):
    # MAE get_2d_sincos_pos_embed: meshgrid(w, h) then grid[0] (the
    # W-coordinates) feeds the FIRST embedding half
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid = np.meshgrid(
        np.arange(gw, dtype=np.float32), np.arange(gh, dtype=np.float32)
    )
    return np.concatenate(
        [_1d(dim // 2, np.asarray(grid[0])), _1d(dim // 2, np.asarray(grid[1]))],
        axis=1,
    )


class TorchAttention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        h = self.num_heads
        qkv = (
            self.qkv(x)
            .reshape(b, n, 3, h, c // h)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * (c // h) ** -0.5
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(x)


class TorchMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(nn.functional.gelu(self.fc1(x), approximate="tanh"))


def modulate(x, shift, scale):
    return x * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)


class TorchDiTBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.attn = TorchAttention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.mlp = TorchMlp(dim, int(dim * mlp_ratio))
        self.adaLN_modulation = nn.Sequential(
            nn.SiLU(), nn.Linear(dim, 6 * dim)
        )

    def forward(self, x, c):
        sa, ca, ga, sm, cm, gm = self.adaLN_modulation(c).chunk(6, dim=1)
        x = x + ga.unsqueeze(1) * self.attn(modulate(self.norm1(x), sa, ca))
        x = x + gm.unsqueeze(1) * self.mlp(modulate(self.norm2(x), sm, cm))
        return x


class TorchFinalLayer(nn.Module):
    def __init__(self, dim, patch, out_ch):
        super().__init__()
        self.norm_final = nn.LayerNorm(
            dim, elementwise_affine=False, eps=1e-6
        )
        self.linear = nn.Linear(dim, patch * patch * out_ch)
        self.adaLN_modulation = nn.Sequential(
            nn.SiLU(), nn.Linear(dim, 2 * dim)
        )

    def forward(self, x, c):
        shift, scale = self.adaLN_modulation(c).chunk(2, dim=1)
        return self.linear(modulate(self.norm_final(x), shift, scale))


class TorchTimestepEmbedder(nn.Module):
    def __init__(self, dim, freq_dim=256):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Linear(freq_dim, dim), nn.SiLU(), nn.Linear(dim, dim)
        )
        self.freq_dim = freq_dim

    def forward(self, t):
        return self.mlp(torch_timestep_embedding(t, self.freq_dim))


class TorchLabelEmbedder(nn.Module):
    def __init__(self, num_classes, dim):
        super().__init__()
        # dropout_prob > 0 in the released models -> +1 null row
        self.embedding_table = nn.Embedding(num_classes + 1, dim)

    def forward(self, y):
        return self.embedding_table(y)


class TorchPatchEmbed(nn.Module):
    """timm PatchEmbed naming: the conv lives at ``.proj``."""

    def __init__(self, in_ch, dim, patch):
        super().__init__()
        self.proj = nn.Conv2d(in_ch, dim, kernel_size=patch, stride=patch)
        self.out_channels = dim

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class TorchDiT(nn.Module):
    def __init__(
        self, in_ch=IN_CH, dim=D, depth=DEPTH, heads=HEADS, patch=P,
        num_classes=NCLS,
    ):
        super().__init__()
        self.patch = patch
        self.out_ch = in_ch
        self.x_embedder = TorchPatchEmbed(in_ch, dim, patch)
        self.t_embedder = TorchTimestepEmbedder(dim)
        self.y_embedder = TorchLabelEmbedder(num_classes, dim)
        self.blocks = nn.ModuleList(
            [TorchDiTBlock(dim, heads) for _ in range(depth)]
        )
        self.final_layer = TorchFinalLayer(dim, patch, self.out_ch)

    def forward(self, x, t, y):
        b, _, hh, ww = x.shape
        gh, gw = hh // self.patch, ww // self.patch
        pos = torch.from_numpy(
            torch_pos_embed(self.x_embedder.out_channels, gh, gw)
        ).float()
        x = self.x_embedder(x) + pos[None]
        c = self.t_embedder(t) + self.y_embedder(y)
        for blk in self.blocks:
            x = blk(x, c)
        x = self.final_layer(x, c)
        # unpatchify
        p = self.patch
        x = x.reshape(b, gh, gw, p, p, self.out_ch)
        x = torch.einsum("nhwpqc->nchpwq", x)
        return x.reshape(b, self.out_ch, gh * p, gw * p)


@pytest.fixture(scope="module")
def torch_model_and_io():
    torch.manual_seed(0)
    model = TorchDiT().eval()
    x = torch.randn(2, IN_CH, 8, 8)
    t = torch.tensor([10.0, 500.0])
    y = torch.tensor([1, 7])
    with torch.no_grad():
        ref = model(x, t, y).numpy()
    return model, x.numpy(), t.numpy(), y.numpy(), ref


def _our_dit(**kw):
    return DiT.from_config(
        dict(
            patch_size=P, hidden_size=D, depth=DEPTH, num_heads=HEADS,
            in_channels=IN_CH, num_classes=NCLS, class_dropout_prob=0.1,
        ),
        **kw,
    )


def _import_and_run(torch_model, x, t, y, scan_blocks):
    dit = _our_dit(scan_blocks=scan_blocks)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))  # NCHW -> NHWC
    params = dit.init(jax.random.PRNGKey(0), xj, jnp.asarray(t),
                      jnp.asarray(y))["params"]
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params = import_params(params, sd, dit_key_map)
    out = dit.apply({"params": params}, xj, jnp.asarray(t), jnp.asarray(y))
    return params, np.transpose(np.asarray(out), (0, 3, 1, 2))  # -> NCHW


def test_pos_embed_matches_mae_quirk():
    ours = _2d_sincos_pos_embed(D, 3, 5)
    ref = torch_pos_embed(D, 3, 5)
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_dit_import_matches_torch(torch_model_and_io):
    model, x, t, y, ref = torch_model_and_io
    _, out = _import_and_run(model, x, t, y, scan_blocks=False)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_dit_import_scanned_matches_torch(torch_model_and_io):
    """strict import straight into the nn.scan stacked layout."""
    model, x, t, y, ref = torch_model_and_io
    params, out = _import_and_run(model, x, t, y, scan_blocks=True)
    assert params["blocks"]["q"]["kernel"].shape == (DEPTH, D, D)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_dit_export_round_trip(torch_model_and_io):
    """export_params puts the tree back into the facebookresearch-DiT
    layout — incl. re-fusing q/k/v into attn.qkv — for both the
    unrolled and scanned layouts."""
    model, x, t, y, _ = torch_model_and_io
    sd_ref = {k: v.numpy() for k, v in model.state_dict().items()}
    for scan in (False, True):
        params, _ = _import_and_run(model, x, t, y, scan_blocks=scan)
        sd = export_params(params, dit_key_map)
        assert set(sd) == set(sd_ref)
        for k in sd_ref:
            np.testing.assert_allclose(
                sd[k], sd_ref[k], atol=1e-6, err_msg=k
            )
