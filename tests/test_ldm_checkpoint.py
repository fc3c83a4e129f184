"""Single-file LDM/A1111 checkpoint conversion tests.

The LDM key-set fixtures here are derived BY HAND from the published
CompVis/Stability flat layouts (ldm/modules/diffusionmodules/
openaimodel.py numbering; ldm/modules/attention.py SpatialTransformer;
the AutoencoderKL in ldm/modules/diffusionmodules/model.py) —
independent of the converter's own table builders — and the diffusers
side reuses the round-2 canonical generators
(tests/test_import_sdxl_fixture.py), so a bias shared with the
converter cannot pass by construction.
"""

import numpy as np
import pytest

from uwudiff_tpu.models.ldm_checkpoint import (
    diffusers_to_ldm,
    diffusers_unet_to_ldm,
    diffusers_vae_to_ldm,
    hf_text_to_openclip,
    is_ldm_checkpoint,
    ldm_to_diffusers,
    ldm_unet_to_diffusers,
    ldm_vae_to_diffusers,
    openclip_text_to_hf,
)

from test_import_sdxl_fixture import (
    KeySet,
    _resnet,
    _transformer2d,
    diffusers_sdxl_unet_keys,
    diffusers_sdxl_vae_keys,
    hf_clip_text_keys,
)


# ---------------------------------------------------------------------
# LDM key-set fixtures (hand-derived flat layouts)
# ---------------------------------------------------------------------


def _ldm_resnet(ks, prefix, cin, cout, temb=1280):
    ks.norm(f"{prefix}.in_layers.0", cin)
    ks.conv(f"{prefix}.in_layers.2", cout, cin, 3)
    if temb:
        ks.linear(f"{prefix}.emb_layers.1", cout, temb)
    ks.norm(f"{prefix}.out_layers.0", cout)
    ks.conv(f"{prefix}.out_layers.3", cout, cout, 3)
    if cin != cout:
        ks.conv(f"{prefix}.skip_connection", cout, cin, 1)


def _ldm_transformer(ks, prefix, dim, n_layers, ctx, linear_proj=True):
    ks.norm(f"{prefix}.norm", dim)
    if linear_proj:
        ks.linear(f"{prefix}.proj_in", dim, dim)
    else:
        ks.conv(f"{prefix}.proj_in", dim, dim, 1)
    for i in range(n_layers):
        b = f"{prefix}.transformer_blocks.{i}"
        for n in ("norm1", "norm2", "norm3"):
            ks.norm(f"{b}.{n}", dim)
        for attn, kv in (("attn1", dim), ("attn2", ctx)):
            ks.linear(f"{b}.{attn}.to_q", dim, dim, bias=False)
            ks.linear(f"{b}.{attn}.to_k", dim, kv, bias=False)
            ks.linear(f"{b}.{attn}.to_v", dim, kv, bias=False)
            ks.linear(f"{b}.{attn}.to_out.0", dim, dim)
        ks.linear(f"{b}.ff.net.0.proj", dim * 8, dim)
        ks.linear(f"{b}.ff.net.2", dim, dim * 4)
    if linear_proj:
        ks.linear(f"{prefix}.proj_out", dim, dim)
    else:
        ks.conv(f"{prefix}.proj_out", dim, dim, 1)


def ldm_sdxl_unet_keys() -> KeySet:
    """model.diffusion_model.* flat layout of SDXL-base (generative-
    models sgm UNetModel: 3 levels [320, 640, 1280], 2 res/level,
    transformer depths [0, 2, 10], ctx 2048, linear projections)."""
    ks = KeySet()
    ks.linear("time_embed.0", 1280, 320)
    ks.linear("time_embed.2", 1280, 1280)
    ks.linear("label_emb.0.0", 1280, 2816)
    ks.linear("label_emb.0.2", 1280, 1280)
    ks.conv("input_blocks.0.0", 320, 4, 3)
    # level 0 (no attention)
    _ldm_resnet(ks, "input_blocks.1.0", 320, 320)
    _ldm_resnet(ks, "input_blocks.2.0", 320, 320)
    ks.conv("input_blocks.3.0.op", 320, 320, 3)
    # level 1 (depth-2 transformers)
    _ldm_resnet(ks, "input_blocks.4.0", 320, 640)
    _ldm_transformer(ks, "input_blocks.4.1", 640, 2, 2048)
    _ldm_resnet(ks, "input_blocks.5.0", 640, 640)
    _ldm_transformer(ks, "input_blocks.5.1", 640, 2, 2048)
    ks.conv("input_blocks.6.0.op", 640, 640, 3)
    # level 2 (depth-10)
    _ldm_resnet(ks, "input_blocks.7.0", 640, 1280)
    _ldm_transformer(ks, "input_blocks.7.1", 1280, 10, 2048)
    _ldm_resnet(ks, "input_blocks.8.0", 1280, 1280)
    _ldm_transformer(ks, "input_blocks.8.1", 1280, 10, 2048)
    # middle
    _ldm_resnet(ks, "middle_block.0", 1280, 1280)
    _ldm_transformer(ks, "middle_block.1", 1280, 10, 2048)
    _ldm_resnet(ks, "middle_block.2", 1280, 1280)
    # up path: 3 res/level, skip-concat inputs, upsample ends levels 0-1
    down_stack = [320, 320, 320, 320, 640, 640, 640, 1280, 1280]
    flat, prev = 0, 1280
    for ch, depth in ((1280, 10), (640, 2), (320, 0)):
        for ri in range(3):
            skip = down_stack.pop()
            _ldm_resnet(ks, f"output_blocks.{flat}.0", prev + skip, ch)
            prev = ch
            if depth:
                _ldm_transformer(ks, f"output_blocks.{flat}.1", ch, depth,
                                 2048)
            if ri == 2 and ch != 320:
                sub = 2 if depth else 1
                ks.conv(f"output_blocks.{flat}.{sub}.conv", ch, ch, 3)
            flat += 1
    ks.norm("out.0", 320)
    ks.conv("out.2", 4, 320, 3)
    return ks


def diffusers_sd15_unet_keys() -> KeySet:
    """diffusers SD1.5 UNet: 4 blocks [320, 640, 1280, 1280], 2
    res/block, 1-layer transformers in blocks 0-2, ctx 768, CONV
    proj_in/proj_out (use_linear_projection=False)."""
    ks = KeySet()
    ks.conv("conv_in", 320, 4, 3)
    ks.linear("time_embedding.linear_1", 1280, 320)
    ks.linear("time_embedding.linear_2", 1280, 1280)
    ks.norm("conv_norm_out", 320)
    ks.conv("conv_out", 4, 320, 3)

    def xf(prefix, dim):
        ks.norm(f"{prefix}.norm", dim)
        ks.conv(f"{prefix}.proj_in", dim, dim, 1)
        b = f"{prefix}.transformer_blocks.0"
        for n in ("norm1", "norm2", "norm3"):
            ks.norm(f"{b}.{n}", dim)
        for attn, kv in (("attn1", dim), ("attn2", 768)):
            ks.linear(f"{b}.{attn}.to_q", dim, dim, bias=False)
            ks.linear(f"{b}.{attn}.to_k", dim, kv, bias=False)
            ks.linear(f"{b}.{attn}.to_v", dim, kv, bias=False)
            ks.linear(f"{b}.{attn}.to_out.0", dim, dim)
        ks.linear(f"{b}.ff.net.0.proj", dim * 8, dim)
        ks.linear(f"{b}.ff.net.2", dim, dim * 4)
        ks.conv(f"{prefix}.proj_out", dim, dim, 1)

    chans = [320, 640, 1280, 1280]
    has_attn = [True, True, True, False]
    prev = 320
    for bi, (ch, attn) in enumerate(zip(chans, has_attn)):
        for ri in range(2):
            _resnet(ks, f"down_blocks.{bi}.resnets.{ri}",
                    prev if ri == 0 else ch, ch)
            if attn:
                xf(f"down_blocks.{bi}.attentions.{ri}", ch)
        prev = ch
        if bi < 3:
            ks.conv(f"down_blocks.{bi}.downsamplers.0.conv", ch, ch, 3)
    _resnet(ks, "mid_block.resnets.0", 1280, 1280)
    xf("mid_block.attentions.0", 1280)
    _resnet(ks, "mid_block.resnets.1", 1280, 1280)
    down_stack = [320, 320, 320, 320, 640, 640, 640, 1280, 1280, 1280,
                  1280, 1280]
    prev = 1280
    for bi, (ch, attn) in enumerate(zip(reversed(chans),
                                        reversed(has_attn))):
        for ri in range(3):
            skip = down_stack.pop()
            _resnet(ks, f"up_blocks.{bi}.resnets.{ri}", prev + skip, ch)
            prev = ch
            if attn:
                xf(f"up_blocks.{bi}.attentions.{ri}", ch)
        if bi < 3:
            ks.conv(f"up_blocks.{bi}.upsamplers.0.conv", ch, ch, 3)
    return ks


def ldm_sd15_unet_keys() -> KeySet:
    """model.diffusion_model.* flat layout of SD1.x (CompVis
    UNetModel: 4 levels [320, 640, 1280, 1280], attention at levels
    0-2, depth-1 transformers, ctx 768, conv projections)."""
    ks = KeySet()
    ks.linear("time_embed.0", 1280, 320)
    ks.linear("time_embed.2", 1280, 1280)
    ks.conv("input_blocks.0.0", 320, 4, 3)
    chans = [320, 640, 1280, 1280]
    has_attn = [True, True, True, False]
    flat, prev = 1, 320
    for li, (ch, attn) in enumerate(zip(chans, has_attn)):
        for ri in range(2):
            _ldm_resnet(ks, f"input_blocks.{flat}.0",
                        prev if ri == 0 else ch, ch)
            if attn:
                _ldm_transformer(ks, f"input_blocks.{flat}.1", ch, 1, 768,
                                 linear_proj=False)
            flat += 1
        prev = ch
        if li < 3:
            ks.conv(f"input_blocks.{flat}.0.op", ch, ch, 3)
            flat += 1
    _ldm_resnet(ks, "middle_block.0", 1280, 1280)
    _ldm_transformer(ks, "middle_block.1", 1280, 1, 768,
                     linear_proj=False)
    _ldm_resnet(ks, "middle_block.2", 1280, 1280)
    down_stack = [320, 320, 320, 320, 640, 640, 640, 1280, 1280, 1280,
                  1280, 1280]
    flat, prev = 0, 1280
    for ch, attn in zip(reversed(chans), reversed(has_attn)):
        for ri in range(3):
            skip = down_stack.pop()
            _ldm_resnet(ks, f"output_blocks.{flat}.0", prev + skip, ch)
            prev = ch
            sub = 1
            if attn:
                _ldm_transformer(ks, f"output_blocks.{flat}.1", ch, 1, 768,
                                 linear_proj=False)
                sub = 2
            if ri == 2 and flat < 11:
                ks.conv(f"output_blocks.{flat}.{sub}.conv", ch, ch, 3)
            flat += 1
    ks.norm("out.0", 320)
    ks.conv("out.2", 4, 320, 3)
    return ks


def ldm_vae_keys() -> KeySet:
    """first_stage_model.* layout (same VAE across SD1.x/2.x/SDXL;
    ldm AutoencoderKL: ch 128, mult (1,2,4,4), 2 res/level encoder,
    3 res/level decoder, decoder.up indexed shallow-first)."""
    ks = KeySet()
    chans = [128, 256, 512, 512]
    ks.conv("encoder.conv_in", 128, 3, 3)
    prev = 128
    for li, ch in enumerate(chans):
        for ri in range(2):
            r = f"encoder.down.{li}.block.{ri}"
            cin = prev if ri == 0 else ch
            ks.norm(f"{r}.norm1", cin)
            ks.conv(f"{r}.conv1", ch, cin, 3)
            ks.norm(f"{r}.norm2", ch)
            ks.conv(f"{r}.conv2", ch, ch, 3)
            if cin != ch:
                ks.conv(f"{r}.nin_shortcut", ch, cin, 1)
        prev = ch
        if li < 3:
            ks.conv(f"encoder.down.{li}.downsample.conv", ch, ch, 3)

    def mid(side):
        for name in ("block_1", "block_2"):
            r = f"{side}.mid.{name}"
            ks.norm(f"{r}.norm1", 512)
            ks.conv(f"{r}.conv1", 512, 512, 3)
            ks.norm(f"{r}.norm2", 512)
            ks.conv(f"{r}.conv2", 512, 512, 3)
        a = f"{side}.mid.attn_1"
        ks.norm(f"{a}.norm", 512)
        for n in ("q", "k", "v", "proj_out"):
            ks.conv(f"{a}.{n}", 512, 512, 1)

    mid("encoder")
    ks.norm("encoder.norm_out", 512)
    ks.conv("encoder.conv_out", 8, 512, 3)
    ks.conv("quant_conv", 8, 8, 1)
    ks.conv("post_quant_conv", 4, 4, 1)
    ks.conv("decoder.conv_in", 512, 4, 3)
    mid("decoder")
    # decoder.up.{i}: i=0 shallowest (128), i=3 deepest (512);
    # upsample on up.1..3
    prev = {0: 256, 1: 512, 2: 512, 3: 512}
    for li, ch in enumerate(chans):  # up.0 ch=128 ... up.3 ch=512
        for ri in range(3):
            r = f"decoder.up.{li}.block.{ri}"
            cin = prev[li] if ri == 0 else ch
            ks.norm(f"{r}.norm1", cin)
            ks.conv(f"{r}.conv1", ch, cin, 3)
            ks.norm(f"{r}.norm2", ch)
            ks.conv(f"{r}.conv2", ch, ch, 3)
            if cin != ch:
                ks.conv(f"{r}.nin_shortcut", ch, cin, 1)
        if li > 0:
            ks.conv(f"decoder.up.{li}.upsample.conv", ch, ch, 3)
    ks.norm("decoder.norm_out", 128)
    ks.conv("decoder.conv_out", 3, 128, 3)
    return ks


def _zeros(ks: KeySet) -> dict:
    return {k: np.zeros(shape, np.float32) for k, shape in ks.items()}


def _rand(ks: KeySet, seed=0) -> dict:
    rng = np.random.default_rng(seed)
    return {k: rng.normal(size=shape).astype(np.float32)
            for k, shape in ks.items()}


# ---------------------------------------------------------------------
# key-set conversion vs the canonical diffusers fixtures
# ---------------------------------------------------------------------


@pytest.mark.parametrize(
    "ldm_keys, diff_keys",
    [
        (ldm_sdxl_unet_keys, diffusers_sdxl_unet_keys),
        (ldm_sd15_unet_keys, diffusers_sd15_unet_keys),
    ],
    ids=["sdxl", "sd15"],
)
def test_unet_keyset_conversion(ldm_keys, diff_keys):
    ldm, want = ldm_keys(), diff_keys()
    got = ldm_unet_to_diffusers(_zeros(ldm))
    assert sorted(got) == sorted(want)
    for k, v in got.items():
        assert v.shape == want[k], k


def test_vae_keyset_conversion():
    ldm, want = ldm_vae_keys(), diffusers_sdxl_vae_keys()
    got = ldm_vae_to_diffusers(_zeros(ldm))
    assert sorted(got) == sorted(want)
    for k, v in got.items():
        assert tuple(v.shape) == tuple(want[k]), k


# ---------------------------------------------------------------------
# value-preserving round trips (export -> single file -> import)
# ---------------------------------------------------------------------


@pytest.mark.parametrize(
    "keys_fn", [diffusers_sdxl_unet_keys, diffusers_sd15_unet_keys],
    ids=["sdxl", "sd15"],
)
def test_unet_roundtrip(keys_fn):
    sd = _rand(keys_fn())
    back = ldm_unet_to_diffusers(diffusers_unet_to_ldm(sd))
    assert sorted(back) == sorted(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])


def test_vae_roundtrip():
    sd = _rand(diffusers_sdxl_vae_keys())
    ldm = diffusers_vae_to_ldm(sd)
    assert sorted(ldm) == sorted(ldm_vae_keys())
    # attention projections re-expand to 1x1 convs on the LDM side
    assert ldm["encoder.mid.attn_1.q.weight"].shape == (512, 512, 1, 1)
    back = ldm_vae_to_diffusers(ldm)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])


def test_openclip_roundtrip():
    hf = _rand(hf_clip_text_keys(32, 2, 64, projection=True))
    oc = hf_text_to_openclip(hf)
    assert "transformer.resblocks.0.attn.in_proj_weight" in oc
    assert "text_projection" in oc and oc["text_projection"].shape == (32, 32)
    back = openclip_text_to_hf(oc)
    assert sorted(back) == sorted(hf)
    for k in hf:
        np.testing.assert_array_equal(back[k], hf[k])


def test_openclip_inproj_row_order_matches_torch_mha():
    """The in_proj_weight split must follow torch's [q; k; v] row
    packing (open_clip runs F.multi_head_attention_forward directly):
    compare a torch nn.MultiheadAttention against explicit q/k/v
    projections from the converted weights."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    d, h, S = 16, 4, 7
    mha = torch.nn.MultiheadAttention(d, h, batch_first=True)
    x = torch.randn(1, S, d)
    causal = torch.full((S, S), float("-inf")).triu(1)
    with torch.no_grad():
        want, _ = mha(x, x, x, attn_mask=causal, need_weights=False)

    conv = openclip_text_to_hf({
        "transformer.resblocks.0.attn.in_proj_weight":
            mha.in_proj_weight.detach().numpy(),
        "transformer.resblocks.0.attn.in_proj_bias":
            mha.in_proj_bias.detach().numpy(),
        "transformer.resblocks.0.attn.out_proj.weight":
            mha.out_proj.weight.detach().numpy(),
        "transformer.resblocks.0.attn.out_proj.bias":
            mha.out_proj.bias.detach().numpy(),
    })
    pre = "text_model.encoder.layers.0.self_attn."
    xn = x.numpy()[0]

    def proj(name):
        return xn @ conv[pre + name + "_proj.weight"].T + \
            conv[pre + name + "_proj.bias"]

    q, k, v = proj("q"), proj("k"), proj("v")
    dh = d // h
    q = q.reshape(S, h, dh).transpose(1, 0, 2)
    k = k.reshape(S, h, dh).transpose(1, 0, 2)
    v = v.reshape(S, h, dh).transpose(1, 0, 2)
    logits = q @ k.transpose(0, 2, 1) / np.sqrt(dh) + causal.numpy()
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    out = (w @ v).transpose(1, 0, 2).reshape(S, d)
    out = out @ conv[pre + "out_proj.weight"].T + conv[pre + "out_proj.bias"]
    np.testing.assert_allclose(out, want.numpy()[0], atol=1e-5)


# ---------------------------------------------------------------------
# whole-file split + loader integration
# ---------------------------------------------------------------------


def _tiny_single_file(tmp_path, arch="sdxl"):
    """Bundle random tiny components into one .safetensors file."""
    unet = _rand(diffusers_sd15_unet_keys()) if arch == "sd1" else \
        _rand(diffusers_sdxl_unet_keys())
    vae = _rand(diffusers_sdxl_vae_keys(), seed=1)
    te1 = _rand(hf_clip_text_keys(32, 2, 64), seed=2)
    te2 = _rand(hf_clip_text_keys(32, 2, 64, projection=True), seed=3)
    tes = [te1] if arch == "sd1" else [te1, te2]
    sd = diffusers_to_ldm(unet=unet, vae=vae, text_encoders=tes, arch=arch)
    return sd, unet, vae, tes


def test_single_file_bundle_and_split():
    sd, unet, vae, tes = _tiny_single_file(None, arch="sdxl")
    assert is_ldm_checkpoint(sd)
    # safetensors.numpy writes the raw buffer: every bundled tensor
    # must be C-contiguous (regression: .T views from the TE fuse)
    assert all(v.flags["C_CONTIGUOUS"] for v in sd.values())
    assert any(k.startswith("conditioner.embedders.1.model.") for k in sd)
    parts = ldm_to_diffusers(sd)
    for k in unet:
        np.testing.assert_array_equal(parts["unet"][k], unet[k])
    for k in vae:
        np.testing.assert_array_equal(parts["vae"][k], vae[k])
    assert len(parts["text_encoders"]) == 2
    for want, got in zip(tes, parts["text_encoders"]):
        assert sorted(got) == sorted(want)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k])


def test_sd1_prefixes():
    sd, *_ = _tiny_single_file(None, arch="sd1")
    assert any(k.startswith("cond_stage_model.transformer.") for k in sd)
    assert not any(k.startswith("conditioner.") for k in sd)
    parts = ldm_to_diffusers(sd)
    assert len(parts["text_encoders"]) == 1


def test_loader_roundtrip_through_single_file(tmp_path):
    """Export a tiny flax UNet to diffusers naming, bundle it into a
    single-file checkpoint, and load it back through the config-driven
    loader (auto-detected LDM layout) — trees must match exactly."""
    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from uwudiff_tpu.loader import ModelLoadConfig, apply_load_config
    from uwudiff_tpu.models.import_torch import export_params, unet_key_map
    from uwudiff_tpu.models.unet import UNet2DConditionModel

    unet = UNet2DConditionModel.from_config("tiny")
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 8, unet.cross_attention_dim))
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]

    sd = export_params(
        params, lambda p: unet_key_map(
            p, use_linear_projection=unet.use_linear_projection)
    )
    bundle = {"model.diffusion_model." + k: v
              for k, v in diffusers_unet_to_ldm(sd).items()}
    path = str(tmp_path / "single.safetensors")
    save_file(bundle, path)

    fresh = jax.tree_util.tree_map(jnp.zeros_like, params)
    cfg = ModelLoadConfig(ckpt_path=path)
    restored = apply_load_config(fresh, cfg, module=unet)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(restored)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
