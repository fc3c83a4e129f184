"""SD3 checkpoint import/export vs a faithful torch transcription of
diffusers' ``SD3Transformer2DModel`` (the released SD3/SD3.5
checkpoints' exact state-dict layout and forward semantics — transcribed
here as an independent oracle, the ``tests/test_dit_import.py`` /
``tests/test_inception.py`` pattern; the reference framework itself has
no MMDiT, see SURVEY §2 extension slots).

Covers the conventions a silent mismatch would corrupt:
- the 192-grid center-cropped positional embedding (base/max-scaled
  FRACTIONAL coordinates, not a fresh [0..gh) grid)
- flip_sin_to_cos timestep embedding feeding timestep+pooled-text MLPs
- adaLN-Zero 6-chunk order on both streams; the LAST block's
  context-stream AdaLayerNormContinuous with its SCALE-FIRST 2-chunk
  (vs the shift-first DiT convention — the key map swaps halves)
- context_pre_only: no to_add_out / ff_context / gates in the final
  block, context output discarded
- per-head RMSNorm on q/k (eps 1e-6), joint attention over the
  concatenated sequence (order-independent), tanh-approx GELU FFs
- norm_out AdaLayerNormContinuous scale-first halves
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from uwudiff_tpu.models.import_torch import (  # noqa: E402
    export_params,
    import_params,
    mmdit_key_map,
)
from uwudiff_tpu.models.mmdit import MMDiT  # noqa: E402

D, HEADS, DEPTH, P, IN_CH = 32, 2, 3, 2, 4
CTX_DIM, POOLED_DIM, T_TXT = 48, 24, 5
POS_MAX, POS_BASE = 12, 4


def torch_timestep_embedding(t, dim, max_period=10000):
    # diffusers Timesteps(flip_sin_to_cos=True, downscale_freq_shift=0)
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period)
        * torch.arange(half, dtype=torch.float32)
        / half
    )
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def torch_cropped_pos_embed(dim, gh, gw, max_size, base_size):
    """diffusers PatchEmbed: bake get_2d_sincos_pos_embed over the full
    max_size grid (coords scaled by base/max), center-crop at runtime."""

    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    coords = np.arange(max_size, dtype=np.float64) * base_size / max_size
    grid = np.meshgrid(coords, coords)  # grid[0]=w feeds the FIRST half
    full = np.concatenate(
        [_1d(dim // 2, np.asarray(grid[0])), _1d(dim // 2, np.asarray(grid[1]))],
        axis=1,
    ).reshape(max_size, max_size, dim)
    top = (max_size - gh) // 2
    left = (max_size - gw) // 2
    return full[top : top + gh, left : left + gw].reshape(gh * gw, dim)


class TorchRMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(var + self.eps)).to(
            x.dtype
        ) * self.weight


class TorchJointAttention(nn.Module):
    """diffusers ``Attention`` with the Joint processor: image stream
    to_q/to_k/to_v/to_out.0, context stream add_*_proj/to_add_out,
    per-head RMSNorm on every q/k."""

    def __init__(self, dim, heads, context_pre_only=False):
        super().__init__()
        self.heads = heads
        self.context_pre_only = context_pre_only
        hd = dim // heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.norm_q = TorchRMSNorm(hd)
        self.norm_k = TorchRMSNorm(hd)
        self.add_q_proj = nn.Linear(dim, dim)
        self.add_k_proj = nn.Linear(dim, dim)
        self.add_v_proj = nn.Linear(dim, dim)
        self.norm_added_q = TorchRMSNorm(hd)
        self.norm_added_k = TorchRMSNorm(hd)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        if not context_pre_only:
            self.to_add_out = nn.Linear(dim, dim)

    def _heads(self, t):
        b, s, c = t.shape
        return t.reshape(b, s, self.heads, c // self.heads).transpose(1, 2)

    def forward(self, x, ctx):
        b, s, c = x.shape
        q = self.norm_q(self._heads(self.to_q(x)))
        k = self.norm_k(self._heads(self.to_k(x)))
        v = self._heads(self.to_v(x))
        qc = self.norm_added_q(self._heads(self.add_q_proj(ctx)))
        kc = self.norm_added_k(self._heads(self.add_k_proj(ctx)))
        vc = self._heads(self.add_v_proj(ctx))
        # diffusers joint order: [image; text]
        q = torch.cat([q, qc], dim=2)
        k = torch.cat([k, kc], dim=2)
        v = torch.cat([v, vc], dim=2)
        out = nn.functional.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, -1, c)
        x_out = self.to_out[0](out[:, :s])
        if self.context_pre_only:
            return x_out, None
        return x_out, self.to_add_out(out[:, s:])


class TorchAdaLNZero(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.linear = nn.Linear(dim, 6 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, c):
        sa, ca, ga, sm, cm, gm = self.linear(
            nn.functional.silu(c)
        ).chunk(6, dim=1)
        return (
            self.norm(x) * (1 + ca[:, None]) + sa[:, None],
            ga[:, None], sm, cm, gm,
        )


class TorchAdaLNContinuous(nn.Module):
    """diffusers AdaLayerNormContinuous: SCALE-first 2-chunk."""

    def __init__(self, dim):
        super().__init__()
        self.linear = nn.Linear(dim, 2 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, c):
        scale, shift = self.linear(nn.functional.silu(c)).chunk(2, dim=1)
        return self.norm(x) * (1 + scale[:, None]) + shift[:, None]


class TorchFeedForward(nn.Module):
    """diffusers FeedForward(activation_fn='gelu-approximate'):
    net.0.proj -> gelu(tanh) -> net.2."""

    def __init__(self, dim, mult=4):
        super().__init__()

        class _Gelu(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(dim, dim * mult)

            def forward(self, x):
                return nn.functional.gelu(self.proj(x), approximate="tanh")

        self.net = nn.ModuleList(
            [_Gelu(), nn.Identity(), nn.Linear(dim * mult, dim)]
        )

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TorchJointBlock(nn.Module):
    def __init__(self, dim, heads, context_pre_only=False):
        super().__init__()
        self.context_pre_only = context_pre_only
        self.norm1 = TorchAdaLNZero(dim)
        if context_pre_only:
            self.norm1_context = TorchAdaLNContinuous(dim)
        else:
            self.norm1_context = TorchAdaLNZero(dim)
        self.attn = TorchJointAttention(dim, heads, context_pre_only)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff = TorchFeedForward(dim)
        if not context_pre_only:
            self.norm2_context = nn.LayerNorm(
                dim, elementwise_affine=False, eps=1e-6
            )
            self.ff_context = TorchFeedForward(dim)

    def forward(self, x, ctx, c):
        hx, gx_a, sx_m, cx_m, gx_m = self.norm1(x, c)
        if self.context_pre_only:
            hc = self.norm1_context(ctx, c)
        else:
            hc, gc_a, sc_m, cc_m, gc_m = self.norm1_context(ctx, c)
        ax, ac = self.attn(hx, hc)
        x = x + gx_a * ax
        x = x + gx_m[:, None] * self.ff(
            self.norm2(x) * (1 + cx_m[:, None]) + sx_m[:, None]
        )
        if self.context_pre_only:
            return x, None
        ctx = ctx + gc_a * ac
        ctx = ctx + gc_m[:, None] * self.ff_context(
            self.norm2_context(ctx) * (1 + cc_m[:, None]) + sc_m[:, None]
        )
        return x, ctx


class TorchSD3Transformer(nn.Module):
    """diffusers SD3Transformer2DModel state-dict layout + forward."""

    def __init__(
        self, dim=D, heads=HEADS, depth=DEPTH, patch=P, in_ch=IN_CH,
        ctx_dim=CTX_DIM, pooled_dim=POOLED_DIM,
    ):
        super().__init__()
        self.patch, self.out_ch, self.dim = patch, in_ch, dim

        class _PatchEmbed(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Conv2d(in_ch, dim, patch, stride=patch)

        class _TimestepEmbedder(nn.Module):
            def __init__(self, in_dim):
                super().__init__()
                self.linear_1 = nn.Linear(in_dim, dim)
                self.linear_2 = nn.Linear(dim, dim)

            def forward(self, e):
                return self.linear_2(
                    nn.functional.silu(self.linear_1(e))
                )

        class _TimeText(nn.Module):
            def __init__(self):
                super().__init__()
                self.timestep_embedder = _TimestepEmbedder(256)
                self.text_embedder = _TimestepEmbedder(pooled_dim)

            def forward(self, t, pooled):
                return self.timestep_embedder(
                    torch_timestep_embedding(t, 256)
                ) + self.text_embedder(pooled)

        self.pos_embed = _PatchEmbed()
        self.time_text_embed = _TimeText()
        self.context_embedder = nn.Linear(ctx_dim, dim)
        self.transformer_blocks = nn.ModuleList(
            [
                TorchJointBlock(
                    dim, heads, context_pre_only=(i == depth - 1)
                )
                for i in range(depth)
            ]
        )
        self.norm_out = TorchAdaLNContinuous(dim)
        self.proj_out = nn.Linear(dim, patch * patch * in_ch)

    def forward(self, x, t, ctx, pooled):
        b, _, hh, ww = x.shape
        p = self.patch
        gh, gw = hh // p, ww // p
        h = self.pos_embed.proj(x).flatten(2).transpose(1, 2)
        h = h + torch.from_numpy(
            torch_cropped_pos_embed(self.dim, gh, gw, POS_MAX, POS_BASE)
        ).float()[None]
        c = self.time_text_embed(t, pooled)
        ctx = self.context_embedder(ctx)
        for blk in self.transformer_blocks:
            h, ctx = blk(h, ctx, c)
        h = self.norm_out(h, c)
        h = self.proj_out(h)
        h = h.reshape(b, gh, gw, p, p, self.out_ch)
        h = torch.einsum("nhwpqc->nchpwq", h)
        return h.reshape(b, self.out_ch, gh * p, gw * p)


@pytest.fixture(scope="module")
def torch_model_and_io():
    torch.manual_seed(0)
    model = TorchSD3Transformer().eval()
    # zero-init heads would hide output-path mismatches: randomize all
    with torch.no_grad():
        for p in model.parameters():
            if p.abs().sum() == 0:
                p.add_(torch.randn_like(p) * 0.02)
        x = torch.randn(2, IN_CH, 8, 8)
        t = torch.tensor([10.0, 500.0])
        ctx = torch.randn(2, T_TXT, CTX_DIM)
        pooled = torch.randn(2, POOLED_DIM)
        ref = model(x, t, ctx, pooled).numpy()
    return model, x.numpy(), t.numpy(), ctx.numpy(), pooled.numpy(), ref


def _our_mmdit(**kw):
    return MMDiT.from_config(
        dict(
            patch_size=P, hidden_size=D, depth=DEPTH, num_heads=HEADS,
            in_channels=IN_CH, context_dim=CTX_DIM, pooled_dim=POOLED_DIM,
            context_pre_only=True, pos_embed_max_size=POS_MAX,
            pos_embed_base_size=POS_BASE,
        ),
        **kw,
    )


def _import_and_run(torch_model, x, t, ctx, pooled, scan_blocks):
    mmdit = _our_mmdit(scan_blocks=scan_blocks)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))  # NCHW -> NHWC
    added = {"text_embeds": jnp.asarray(pooled)}
    params = mmdit.init(
        jax.random.PRNGKey(0), xj, jnp.asarray(t), jnp.asarray(ctx),
        added_cond=added,
    )["params"]
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params = import_params(
        params, sd, lambda p: mmdit_key_map(p, depth=DEPTH)
    )
    out = mmdit.apply(
        {"params": params}, xj, jnp.asarray(t), jnp.asarray(ctx),
        added_cond=added,
    )
    return params, np.transpose(np.asarray(out), (0, 3, 1, 2))


def test_cropped_pos_embed_matches_diffusers_convention():
    from uwudiff_tpu.models.dit import _2d_sincos_pos_embed

    gh, gw = 4, 4
    scale = POS_BASE / POS_MAX
    top, left = (POS_MAX - gh) // 2, (POS_MAX - gw) // 2
    ours = _2d_sincos_pos_embed(
        D, gh, gw,
        h_coords=(top + np.arange(gh)) * scale,
        w_coords=(left + np.arange(gw)) * scale,
    )
    ref = torch_cropped_pos_embed(D, gh, gw, POS_MAX, POS_BASE)
    np.testing.assert_allclose(ours, ref, atol=1e-12)
    # the fresh-grid embedding is genuinely different — the crop matters
    assert not np.allclose(ours, _2d_sincos_pos_embed(D, gh, gw))


def test_mmdit_import_matches_torch(torch_model_and_io):
    model, x, t, ctx, pooled, ref = torch_model_and_io
    _, out = _import_and_run(model, x, t, ctx, pooled, scan_blocks=False)
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-5)


def test_mmdit_import_scanned_matches_torch(torch_model_and_io):
    """strict import straight into the nn.scan stacked layout (the
    final context_pre_only block stays unscanned under its own name)."""
    model, x, t, ctx, pooled, ref = torch_model_and_io
    params, out = _import_and_run(
        model, x, t, ctx, pooled, scan_blocks=True
    )
    assert params["blocks"]["attn1"]["to_q"]["kernel"].shape == (
        DEPTH - 1, D, D,
    )
    assert "to_out" not in params["final_block"]["attn2"]
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-5)


def test_mmdit_export_round_trip(torch_model_and_io):
    """export_params puts the tree back into the diffusers layout —
    incl. un-swapping the scale/shift halves — for both layouts."""
    model, x, t, ctx, pooled, _ = torch_model_and_io
    sd_ref = {k: v.numpy() for k, v in model.state_dict().items()}
    for scan in (False, True):
        params, _ = _import_and_run(
            model, x, t, ctx, pooled, scan_blocks=scan
        )
        sd = export_params(
            params, lambda p: mmdit_key_map(p, depth=DEPTH)
        )
        assert set(sd) == set(sd_ref)
        for k in sd_ref:
            np.testing.assert_allclose(
                sd[k], sd_ref[k], atol=1e-6, err_msg=k
            )
