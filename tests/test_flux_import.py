"""Flux checkpoint import/export vs a faithful torch transcription of
diffusers' ``FluxTransformer2DModel`` (the released flux-dev/schnell
checkpoints' exact state-dict layout and forward semantics — transcribed
here as an independent oracle, the ``tests/test_mmdit_import.py``
pattern; the reference framework has no Flux, see SURVEY §2 extension
slots).

Covers the conventions a silent mismatch would corrupt:
- 2x2 latent packing with (C, ph, pw) feature order (the pipeline's
  _pack_latents/_unpack_latents), Dense (not conv) x_embedder
- 3-axis theta-10000 rotary tables (repeat-interleaved cos/sin, float64
  accumulation), text tokens at the (0,0,0) origin, [text; image]
  joint order, rotation on (even, odd) pairs
- timestep AND guidance (x1000) sinusoids feeding their MLPs, pooled
  projection added
- double blocks: adaLN-Zero 6-chunk per stream, per-head RMSNorm
  (eps 1e-6) on q/k of both streams, tanh-approx GELU FFs
- single blocks: 3-chunk modulation, PARALLEL attention+MLP from one
  pre-norm, no attention out-projection, fused [attn; mlp] proj_out
- norm_out AdaLayerNormContinuous SCALE-first halves (no swap needed —
  models/flux.py's head is also scale-first)
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from uwudiff_tpu.models.flux import Flux, flux_rope_table  # noqa: E402
from uwudiff_tpu.models.import_torch import (  # noqa: E402
    export_params,
    flux_key_map,
    import_params,
)

D, HEADS, DEPTH, DEPTH_S, P, IN_CH = 32, 2, 2, 2, 2, 4
CTX_DIM, POOLED_DIM, T_TXT = 48, 24, 5
AXES = (4, 6, 6)  # sums to the 16-dim head


def torch_timestep_embedding(t, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period)
        * torch.arange(half, dtype=torch.float32)
        / half
    )
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def torch_rope_tables(ids):
    """diffusers FluxPosEmbed: per axis freqs = pos * theta^(-2i/d),
    cos/sin repeat-interleaved, axes concatenated (float64)."""
    cos_l, sin_l = [], []
    for a, dim in enumerate(AXES):
        omega = 1.0 / 10000.0 ** (
            np.arange(0, dim, 2, dtype=np.float64) / dim
        )
        freqs = np.outer(np.asarray(ids, np.float64)[:, a], omega)
        cos_l.append(np.repeat(np.cos(freqs), 2, axis=-1))
        sin_l.append(np.repeat(np.sin(freqs), 2, axis=-1))
    cos = torch.from_numpy(np.concatenate(cos_l, -1)).float()
    sin = torch.from_numpy(np.concatenate(sin_l, -1)).float()
    return cos, sin


def torch_apply_rope(x, cos, sin):
    """x [B, H, S, D]: out = x*cos + interleave(-x_odd, x_even)*sin."""
    xr = x.reshape(*x.shape[:-1], -1, 2)
    real, imag = xr.unbind(-1)
    rotated = torch.stack([-imag, real], dim=-1).reshape(x.shape)
    return x * cos + rotated * sin


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


class TorchFluxJointAttention(nn.Module):
    """diffusers Attention with the Flux processor: per-stream
    projections, per-head RMSNorm on q/k, rope on the [text; image]
    joint sequence."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
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
        self.to_add_out = nn.Linear(dim, dim)

    def _heads(self, t):
        b, s, c = t.shape
        return t.reshape(b, s, self.heads, c // self.heads).transpose(1, 2)

    def forward(self, x, ctx, cos, sin):
        b, s, c = x.shape
        t = ctx.shape[1]
        q = self.norm_q(self._heads(self.to_q(x)))
        k = self.norm_k(self._heads(self.to_k(x)))
        v = self._heads(self.to_v(x))
        qc = self.norm_added_q(self._heads(self.add_q_proj(ctx)))
        kc = self.norm_added_k(self._heads(self.add_k_proj(ctx)))
        vc = self._heads(self.add_v_proj(ctx))
        # Flux joint order: [text; image]
        q = torch.cat([qc, q], dim=2)
        k = torch.cat([kc, k], dim=2)
        v = torch.cat([vc, v], dim=2)
        q = torch_apply_rope(q, cos, sin)
        k = torch_apply_rope(k, cos, sin)
        out = nn.functional.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, -1, c)
        return self.to_out[0](out[:, t:]), self.to_add_out(out[:, :t])


class TorchAdaLNZero(nn.Module):
    def __init__(self, dim, n=6):
        super().__init__()
        self.n = n
        self.linear = nn.Linear(dim, n * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, c):
        chunks = self.linear(nn.functional.silu(c)).chunk(self.n, dim=1)
        shift, scale = chunks[0], chunks[1]
        h = self.norm(x) * (1 + scale[:, None]) + shift[:, None]
        return (h,) + tuple(ch[:, None] for ch in chunks[2:])


class TorchFeedForward(nn.Module):
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


class TorchFluxDoubleBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = TorchAdaLNZero(dim)
        self.norm1_context = TorchAdaLNZero(dim)
        self.attn = TorchFluxJointAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff = TorchFeedForward(dim)
        self.norm2_context = nn.LayerNorm(
            dim, elementwise_affine=False, eps=1e-6
        )
        self.ff_context = TorchFeedForward(dim)

    def forward(self, x, ctx, c, cos, sin):
        hx, gx_a, sx_m, cx_m, gx_m = self.norm1(x, c)
        hc, gc_a, sc_m, cc_m, gc_m = self.norm1_context(ctx, c)
        ax, ac = self.attn(hx, hc, cos, sin)
        x = x + gx_a * ax
        x = x + gx_m * self.ff(self.norm2(x) * (1 + cx_m) + sx_m)
        ctx = ctx + gc_a * ac
        ctx = ctx + gc_m * self.ff_context(
            self.norm2_context(ctx) * (1 + cc_m) + sc_m
        )
        return x, ctx


class TorchFluxSingleBlock(nn.Module):
    """Parallel attention+MLP from ONE pre-norm; fused proj_out."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        hd = dim // heads
        self.norm = TorchAdaLNZero(dim, n=3)

        class _Attn(nn.Module):
            def __init__(self):
                super().__init__()
                self.to_q = nn.Linear(dim, dim)
                self.to_k = nn.Linear(dim, dim)
                self.to_v = nn.Linear(dim, dim)
                self.norm_q = TorchRMSNorm(hd)
                self.norm_k = TorchRMSNorm(hd)

        self.attn = _Attn()
        self.proj_mlp = nn.Linear(dim, 4 * dim)
        self.proj_out = nn.Linear(dim + 4 * dim, dim)

    def _heads(self, t):
        b, s, c = t.shape
        return t.reshape(b, s, self.heads, c // self.heads).transpose(1, 2)

    def forward(self, h, c, cos, sin):
        hn, gate = self.norm(h, c)
        mlp = nn.functional.gelu(self.proj_mlp(hn), approximate="tanh")
        q = self.attn.norm_q(self._heads(self.attn.to_q(hn)))
        k = self.attn.norm_k(self._heads(self.attn.to_k(hn)))
        v = self._heads(self.attn.to_v(hn))
        q = torch_apply_rope(q, cos, sin)
        k = torch_apply_rope(k, cos, sin)
        a = nn.functional.scaled_dot_product_attention(q, k, v)
        a = a.transpose(1, 2).reshape(h.shape)
        return h + gate * self.proj_out(torch.cat([a, mlp], dim=-1))


class TorchAdaLNContinuous(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.linear = nn.Linear(dim, 2 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, c):
        scale, shift = self.linear(nn.functional.silu(c)).chunk(2, dim=1)
        return self.norm(x) * (1 + scale[:, None]) + shift[:, None]


class TorchFluxTransformer(nn.Module):
    """diffusers FluxTransformer2DModel state-dict layout + forward
    (incl. the pipeline's pack/unpack around it)."""

    def __init__(self, dim=D, heads=HEADS):
        super().__init__()
        self.dim, self.heads = dim, heads
        self.x_embedder = nn.Linear(IN_CH * P * P, dim)
        self.context_embedder = nn.Linear(CTX_DIM, dim)

        class _TimestepEmbedder(nn.Module):
            def __init__(self, in_dim):
                super().__init__()
                self.linear_1 = nn.Linear(in_dim, dim)
                self.linear_2 = nn.Linear(dim, dim)

            def forward(self, e):
                return self.linear_2(nn.functional.silu(self.linear_1(e)))

        class _TimeText(nn.Module):
            def __init__(self):
                super().__init__()
                self.timestep_embedder = _TimestepEmbedder(256)
                self.guidance_embedder = _TimestepEmbedder(256)
                self.text_embedder = _TimestepEmbedder(POOLED_DIM)

            def forward(self, t, guidance, pooled):
                return (
                    self.timestep_embedder(torch_timestep_embedding(t, 256))
                    + self.guidance_embedder(
                        torch_timestep_embedding(guidance * 1000.0, 256)
                    )
                    + self.text_embedder(pooled)
                )

        self.time_text_embed = _TimeText()
        self.transformer_blocks = nn.ModuleList(
            [TorchFluxDoubleBlock(dim, heads) for _ in range(DEPTH)]
        )
        self.single_transformer_blocks = nn.ModuleList(
            [TorchFluxSingleBlock(dim, heads) for _ in range(DEPTH_S)]
        )
        self.norm_out = TorchAdaLNContinuous(dim)
        self.proj_out = nn.Linear(dim, P * P * IN_CH)

    def forward(self, latents_nchw, t, guidance, ctx, pooled):
        b, cch, hh, ww = latents_nchw.shape
        gh, gw = hh // P, ww // P
        # pipeline _pack_latents: (C, ph, pw) feature order
        x = latents_nchw.view(b, cch, gh, P, gw, P)
        x = x.permute(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, cch * P * P)
        h = self.x_embedder(x)
        c = self.time_text_embed(t, guidance, pooled)
        ctx = self.context_embedder(ctx)

        n_txt = ctx.shape[1]
        ids = np.concatenate(
            [
                np.zeros((n_txt, 3)),
                np.stack(
                    [
                        np.zeros(gh * gw),
                        np.repeat(np.arange(gh), gw),
                        np.tile(np.arange(gw), gh),
                    ],
                    axis=-1,
                ),
            ]
        )
        cos, sin = torch_rope_tables(ids)

        for blk in self.transformer_blocks:
            h, ctx = blk(h, ctx, c, cos, sin)
        hcat = torch.cat([ctx, h], dim=1)
        for blk in self.single_transformer_blocks:
            hcat = blk(hcat, c, cos, sin)
        h = hcat[:, n_txt:]
        h = self.norm_out(h, c)
        h = self.proj_out(h)
        # pipeline _unpack_latents
        h = h.view(b, gh, gw, cch, P, P)
        h = h.permute(0, 3, 1, 4, 2, 5).reshape(b, cch, gh * P, gw * P)
        return h


@pytest.fixture(scope="module")
def torch_model_and_io():
    torch.manual_seed(0)
    model = TorchFluxTransformer().eval()
    with torch.no_grad():
        for p in model.parameters():
            if p.abs().sum() == 0:
                p.add_(torch.randn_like(p) * 0.02)
        x = torch.randn(2, IN_CH, 8, 8)
        t = torch.tensor([10.0, 500.0])
        g = torch.tensor([3.5, 3.5])
        ctx = torch.randn(2, T_TXT, CTX_DIM)
        pooled = torch.randn(2, POOLED_DIM)
        ref = model(x, t, g, ctx, pooled).numpy()
    return model, x.numpy(), t.numpy(), ctx.numpy(), pooled.numpy(), ref


def _our_flux(**kw):
    return Flux.from_config(
        dict(
            patch_size=P, hidden_size=D, depth=DEPTH, depth_single=DEPTH_S,
            num_heads=HEADS, in_channels=IN_CH, context_dim=CTX_DIM,
            pooled_dim=POOLED_DIM, guidance_embeds=True,
            default_guidance=3.5, axes_dims=AXES,
        ),
        **kw,
    )


def _import_and_run(torch_model, x, t, ctx, pooled, scan_blocks):
    flux = _our_flux(scan_blocks=scan_blocks)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))  # NCHW -> NHWC
    added = {"text_embeds": jnp.asarray(pooled)}
    params = flux.init(
        jax.random.PRNGKey(0), xj, jnp.asarray(t), jnp.asarray(ctx),
        added_cond=added,
    )["params"]
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params = import_params(params, sd, flux_key_map)
    out = flux.apply(
        {"params": params}, xj, jnp.asarray(t), jnp.asarray(ctx),
        added_cond=added,
    )
    return params, np.transpose(np.asarray(out), (0, 3, 1, 2))


def test_rope_table_matches_torch_oracle():
    ids = np.array([[0, 0, 0], [0, 1, 2], [3, 4, 5]])
    cos_t, sin_t = torch_rope_tables(ids)
    cos_j, sin_j = flux_rope_table(ids, AXES)
    np.testing.assert_allclose(cos_j, cos_t.numpy(), atol=1e-7)
    np.testing.assert_allclose(sin_j, sin_t.numpy(), atol=1e-7)


def test_flux_import_matches_torch(torch_model_and_io):
    model, x, t, ctx, pooled, ref = torch_model_and_io
    _, out = _import_and_run(model, x, t, ctx, pooled, scan_blocks=False)
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-5)


def test_flux_import_scanned_matches_torch(torch_model_and_io):
    """strict import straight into BOTH nn.scan stacked layouts."""
    model, x, t, ctx, pooled, ref = torch_model_and_io
    params, out = _import_and_run(model, x, t, ctx, pooled, scan_blocks=True)
    assert params["blocks"]["attn1"]["to_q"]["kernel"].shape == (DEPTH, D, D)
    assert params["single_blocks"]["proj_mlp"]["kernel"].shape == (
        DEPTH_S, D, 4 * D,
    )
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-5)


def test_flux_export_round_trip(torch_model_and_io):
    model, x, t, ctx, pooled, _ = torch_model_and_io
    sd_ref = {k: v.numpy() for k, v in model.state_dict().items()}
    for scan in (False, True):
        params, _ = _import_and_run(model, x, t, ctx, pooled, scan)
        sd = export_params(params, flux_key_map)
        assert set(sd) == set(sd_ref)
        for k in sd_ref:
            np.testing.assert_allclose(sd[k], sd_ref[k], atol=1e-6, err_msg=k)


def test_flux_schnell_has_no_guidance_leaves():
    flux = _our_flux(guidance_embeds=False)
    xj = jnp.zeros((1, 8, 8, IN_CH))
    params = flux.init(
        jax.random.PRNGKey(0), xj, jnp.zeros((1,)),
        jnp.zeros((1, T_TXT, CTX_DIM)),
        added_cond={"text_embeds": jnp.zeros((1, POOLED_DIM))},
    )["params"]
    assert "g_fc1" not in params
    # every leaf still maps (strict export over the schnell layout)
    sd = export_params(params, flux_key_map)
    assert not any("guidance" in k for k in sd)
