"""Pretrained-weight import: torch/diffusers/transformers checkpoints ->
our flax param trees.

Capability parity with the reference's pretrained loading
(``from_pretrained`` targets in ``configs/model/pretrained_sdxl.yaml``,
ckpt surgery in ``duwu/loader.py:24-46``). The environment has no hub
access, so this operates on local ``.pt``/``.bin``/``.safetensors``
files.

The translation is rule-based over OUR param paths: each flax path maps
to a torch key plus a tensor transform (conv OIHW->HWIO, linear
[out,in]->[in,out] transpose, norm weight->scale, embedding passthrough).
"""

from __future__ import annotations

import re
from typing import Any, Callable

import jax
import numpy as np

__all__ = [
    "load_torch_state_dict",
    "extract_state_dict",
    "import_params",
    "export_params",
    "unet_key_map",
    "controlnet_key_map",
    "vae_key_map",
    "clip_text_key_map",
    "clip_vision_key_map",
    "t5_key_map",
    "inception_key_map",
    "dit_key_map",
    "mmdit_key_map",
    "flux_key_map",
    "stack_block_params",
    "unstack_block_params",
]


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch checkpoint into numpy arrays (cpu, no grad state)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


def extract_state_dict(
    state_dict: dict, key: str | None = None, prefix: str | None = None
) -> dict:
    """Sub-dict extraction (``duwu/loader.py:24-33`` semantics)."""
    if key is not None:
        state_dict = state_dict[key]
    if prefix is None:
        return state_dict
    return {
        k[len(prefix):]: v
        for k, v in state_dict.items()
        if k.startswith(prefix)
    }


# --- tensor transforms ---


def _t_linear(w):  # [out, in] -> [in, out]
    return np.transpose(w, (1, 0))


def _t_conv(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _identity(w):
    return w


# --- path translation rules ---
# each rule: (regex on our "/"-joined path, torch key template, transform)
# `\g<N>` backrefs renumber indices straight through.

_UNET_RULES: list[tuple[str, str, Callable]] = [
    (r"^conv_in/kernel$", "conv_in.weight", _t_conv),
    (r"^conv_in/bias$", "conv_in.bias", _identity),
    (r"^conv_out/kernel$", "conv_out.weight", _t_conv),
    (r"^conv_out/bias$", "conv_out.bias", _identity),
    (r"^conv_norm_out/scale$", "conv_norm_out.weight", _identity),
    (r"^conv_norm_out/bias$", "conv_norm_out.bias", _identity),
    (r"^time_embedding/linear_(\d)/kernel$",
     r"time_embedding.linear_\1.weight", _t_linear),
    (r"^time_embedding/linear_(\d)/bias$",
     r"time_embedding.linear_\1.bias", _identity),
    (r"^add_embedding/linear_(\d)/kernel$",
     r"add_embedding.linear_\1.weight", _t_linear),
    (r"^add_embedding/linear_(\d)/bias$",
     r"add_embedding.linear_\1.bias", _identity),
    # resnets
    (r"^down_(\d+)_res_(\d+)/", r"down_blocks.\1.resnets.\2.", None),
    (r"^up_(\d+)_res_(\d+)/", r"up_blocks.\1.resnets.\2.", None),
    (r"^mid_res_(\d+)/", r"mid_block.resnets.\1.", None),
    # transformers
    (r"^down_(\d+)_attn_(\d+)/", r"down_blocks.\1.attentions.\2.", None),
    (r"^up_(\d+)_attn_(\d+)/", r"up_blocks.\1.attentions.\2.", None),
    (r"^mid_attn/", r"mid_block.attentions.0.", None),
    # samplers (leaf rules map conv/kernel -> conv.weight)
    (r"^down_(\d+)_downsample/", r"down_blocks.\1.downsamplers.0.", None),
    (r"^up_(\d+)_upsample/", r"up_blocks.\1.upsamplers.0.", None),
]

def _t_concat_linear(ws):  # N x [out, in] -> [in, N*out]
    return np.concatenate([_t_linear(w) for w in ws], axis=-1)


# fused-projection leaves (models/transformer.py fused_qkv=True): one
# flax kernel gathers several separate diffusers tensors
_FUSED_LEAF_RULES: list[tuple[str, list[str], Callable]] = [
    (r"(.*\.)blocks_(\d+)/attn(\d)/to_qkv/kernel$",
     [r"\1transformer_blocks.\2.attn\3.to_q.weight",
      r"\1transformer_blocks.\2.attn\3.to_k.weight",
      r"\1transformer_blocks.\2.attn\3.to_v.weight"], _t_concat_linear),
    (r"(.*\.)blocks_(\d+)/attn(\d)/to_kv/kernel$",
     [r"\1transformer_blocks.\2.attn\3.to_k.weight",
      r"\1transformer_blocks.\2.attn\3.to_v.weight"], _t_concat_linear),
]


# within-module leaf rules (applied after the block-prefix rewrite)
_LEAF_RULES: list[tuple[str, str, Callable]] = [
    # resnet leaves
    (r"(.*\.)norm(\d)/scale$", r"\1norm\2.weight", _identity),
    (r"(.*\.)norm(\d)/bias$", r"\1norm\2.bias", _identity),
    (r"(.*\.)conv(\d)/kernel$", r"\1conv\2.weight", _t_conv),
    (r"(.*\.)conv(\d)/bias$", r"\1conv\2.bias", _identity),
    (r"(.*\.)conv_shortcut/kernel$", r"\1conv_shortcut.weight", _t_conv),
    (r"(.*\.)conv_shortcut/bias$", r"\1conv_shortcut.bias", _identity),
    (r"(.*\.)time_emb_proj/kernel$", r"\1time_emb_proj.weight", _t_linear),
    (r"(.*\.)time_emb_proj/bias$", r"\1time_emb_proj.bias", _identity),
    (r"(.*\.)conv/kernel$", r"\1conv.weight", _t_conv),
    (r"(.*\.)conv/bias$", r"\1conv.bias", _identity),
    # transformer2d leaves
    (r"(.*\.)norm/scale$", r"\1norm.weight", _identity),
    (r"(.*\.)norm/bias$", r"\1norm.bias", _identity),
    (r"(.*\.)proj_in/kernel$", r"\1proj_in.weight", None),  # conv or linear
    (r"(.*\.)proj_in/bias$", r"\1proj_in.bias", _identity),
    (r"(.*\.)proj_out/kernel$", r"\1proj_out.weight", None),
    (r"(.*\.)proj_out/bias$", r"\1proj_out.bias", _identity),
    (r"(.*\.)blocks_(\d+)/norm(\d)/scale$",
     r"\1transformer_blocks.\2.norm\3.weight", _identity),
    (r"(.*\.)blocks_(\d+)/norm(\d)/bias$",
     r"\1transformer_blocks.\2.norm\3.bias", _identity),
    (r"(.*\.)blocks_(\d+)/attn(\d)/to_(q|k|v)/kernel$",
     r"\1transformer_blocks.\2.attn\3.to_\4.weight", _t_linear),
    (r"(.*\.)blocks_(\d+)/attn(\d)/to_out/kernel$",
     r"\1transformer_blocks.\2.attn\3.to_out.0.weight", _t_linear),
    (r"(.*\.)blocks_(\d+)/attn(\d)/to_out/bias$",
     r"\1transformer_blocks.\2.attn\3.to_out.0.bias", _identity),
    (r"(.*\.)blocks_(\d+)/ff/proj_in/kernel$",
     r"\1transformer_blocks.\2.ff.net.0.proj.weight", _t_linear),
    (r"(.*\.)blocks_(\d+)/ff/proj_in/bias$",
     r"\1transformer_blocks.\2.ff.net.0.proj.bias", _identity),
    (r"(.*\.)blocks_(\d+)/ff/proj_out/kernel$",
     r"\1transformer_blocks.\2.ff.net.2.weight", _t_linear),
    (r"(.*\.)blocks_(\d+)/ff/proj_out/bias$",
     r"\1transformer_blocks.\2.ff.net.2.bias", _identity),
]


def unet_key_map(our_path: str, use_linear_projection: bool = True):
    """our flax path -> (torch key, transform) for the UNet."""
    path = our_path
    for pat, repl, tr in _UNET_RULES:
        if re.match(pat, path):
            if repl.endswith("."):  # block-prefix rewrite; leaf rules follow
                path = re.sub(pat, repl, path)
                break
            return re.sub(pat, repl, path), tr
    for pat, repls, tr in _FUSED_LEAF_RULES:
        if re.match(pat, path):
            return [re.sub(pat, r, path) for r in repls], tr
    for pat, repl, tr in _LEAF_RULES:
        m = re.match(pat, path)
        if m:
            key = re.sub(pat, repl, path)
            if tr is None:  # proj_in/proj_out: conv (4D) vs linear (2D)
                tr = "proj"
            return key, tr
    raise KeyError(f"no torch mapping for UNet param {our_path!r}")


def _clip_rules():
    return [
        (r"^token_embedding/embedding$",
         "text_model.embeddings.token_embedding.weight", _identity),
        (r"^position_embedding$",
         "text_model.embeddings.position_embedding.weight", _identity),
        (r"^final_layer_norm/scale$", "text_model.final_layer_norm.weight",
         _identity),
        (r"^final_layer_norm/bias$", "text_model.final_layer_norm.bias",
         _identity),
        (r"^text_projection/kernel$", "text_projection.weight", _t_linear),
        (r"^layers_(\d+)/layer_norm(\d)/scale$",
         r"text_model.encoder.layers.\1.layer_norm\2.weight", _identity),
        (r"^layers_(\d+)/layer_norm(\d)/bias$",
         r"text_model.encoder.layers.\1.layer_norm\2.bias", _identity),
        (r"^layers_(\d+)/(q|k|v|out)_proj/kernel$",
         r"text_model.encoder.layers.\1.self_attn.\2_proj.weight", _t_linear),
        (r"^layers_(\d+)/(q|k|v|out)_proj/bias$",
         r"text_model.encoder.layers.\1.self_attn.\2_proj.bias", _identity),
        (r"^layers_(\d+)/fc(\d)/kernel$",
         r"text_model.encoder.layers.\1.mlp.fc\2.weight", _t_linear),
        (r"^layers_(\d+)/fc(\d)/bias$",
         r"text_model.encoder.layers.\1.mlp.fc\2.bias", _identity),
    ]


def clip_text_key_map(our_path: str):
    for pat, repl, tr in _clip_rules():
        if re.match(pat, our_path):
            return re.sub(pat, repl, our_path), tr
    raise KeyError(f"no torch mapping for CLIP param {our_path!r}")


_T5_RULES = [
    (r"^token_embedding/embedding$", "shared.weight", _identity),
    (r"^relative_attention_bias/embedding$",
     "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight",
     _identity),
    (r"^final_norm/scale$", "encoder.final_layer_norm.weight", _identity),
    (r"^layers_(\d+)/attn_norm/scale$",
     r"encoder.block.\1.layer.0.layer_norm.weight", _identity),
    (r"^layers_(\d+)/(q|k|v|o)/kernel$",
     r"encoder.block.\1.layer.0.SelfAttention.\2.weight", _t_linear),
    (r"^layers_(\d+)/ff_norm/scale$",
     r"encoder.block.\1.layer.1.layer_norm.weight", _identity),
    (r"^layers_(\d+)/(wi_0|wi_1|wo)/kernel$",
     r"encoder.block.\1.layer.1.DenseReluDense.\2.weight", _t_linear),
]


class _SplitLinear:
    """One torch tensor stacked along dim 0 feeding SEVERAL flax leaves
    — e.g. the facebookresearch-DiT fused ``attn.qkv.weight`` [3*D, D]
    whose rows [q; k; v] land in our separate q/k/v kernels. ``j`` of
    ``n`` selects the slice; 2-D kernels transpose, 1-D biases slice
    as-is. ``export_params`` re-concatenates the parts."""

    def __init__(self, n: int, j: int):
        self.n, self.j = n, j

    def __call__(self, w):
        part = np.split(np.asarray(w), self.n, axis=0)[self.j]
        return _t_linear(part) if part.ndim == 2 else part

    def inverse_part(self, w):  # flax leaf -> its torch slice
        w = np.asarray(w)
        return _inv_linear(w) if w.ndim == 2 else w


# facebookresearch-DiT state-dict naming (the released DiT-XL/2 etc.
# ImageNet checkpoints). The torch ``pos_embed`` entry is skipped: ours
# is recomputed by `_2d_sincos_pos_embed`, which matches the MAE helper
# those checkpoints baked in bit-for-bit. norm1/norm2/norm_final carry
# no params on either side (elementwise_affine=False there,
# use_scale/use_bias=False here).
_DIT_RULES: list[tuple[str, str, Callable]] = [
    (r"^patch_embed/kernel$", "x_embedder.proj.weight", _t_conv),
    (r"^patch_embed/bias$", "x_embedder.proj.bias", _identity),
    (r"^t_fc1/kernel$", "t_embedder.mlp.0.weight", _t_linear),
    (r"^t_fc1/bias$", "t_embedder.mlp.0.bias", _identity),
    (r"^t_fc2/kernel$", "t_embedder.mlp.2.weight", _t_linear),
    (r"^t_fc2/bias$", "t_embedder.mlp.2.bias", _identity),
    (r"^label_embed/embedding$",
     "y_embedder.embedding_table.weight", _identity),
    (r"^blocks_(\d+)/adaLN_modulation/kernel$",
     r"blocks.\1.adaLN_modulation.1.weight", _t_linear),
    (r"^blocks_(\d+)/adaLN_modulation/bias$",
     r"blocks.\1.adaLN_modulation.1.bias", _identity),
    (r"^blocks_(\d+)/q/(kernel|bias)$",
     r"blocks.\1.attn.qkv.{leaf}", _SplitLinear(3, 0)),
    (r"^blocks_(\d+)/k/(kernel|bias)$",
     r"blocks.\1.attn.qkv.{leaf}", _SplitLinear(3, 1)),
    (r"^blocks_(\d+)/v/(kernel|bias)$",
     r"blocks.\1.attn.qkv.{leaf}", _SplitLinear(3, 2)),
    (r"^blocks_(\d+)/proj/kernel$", r"blocks.\1.attn.proj.weight",
     _t_linear),
    (r"^blocks_(\d+)/proj/bias$", r"blocks.\1.attn.proj.bias", _identity),
    (r"^blocks_(\d+)/mlp_fc(\d)/kernel$",
     r"blocks.\1.mlp.fc\2.weight", _t_linear),
    (r"^blocks_(\d+)/mlp_fc(\d)/bias$",
     r"blocks.\1.mlp.fc\2.bias", _identity),
    (r"^final_modulation/kernel$",
     "final_layer.adaLN_modulation.1.weight", _t_linear),
    (r"^final_modulation/bias$",
     "final_layer.adaLN_modulation.1.bias", _identity),
    (r"^final_proj/kernel$", "final_layer.linear.weight", _t_linear),
    (r"^final_proj/bias$", "final_layer.linear.bias", _identity),
]


def _t_swap_halves_linear(w):
    """[2D, in] -> [in, 2D] with the two output halves SWAPPED — bridges
    diffusers' scale-first ``AdaLayerNormContinuous`` chunk order
    (``scale, shift = chunk(emb, 2)``) to this framework's shift-first
    modulation heads (DiT final-layer convention)."""
    a, b = np.split(np.asarray(w), 2, axis=0)
    return _t_linear(np.concatenate([b, a], axis=0))


def _swap_halves(w):  # the bias-side companion (its own inverse)
    a, b = np.split(np.asarray(w), 2, axis=0)
    return np.concatenate([b, a], axis=0)


# diffusers SD3Transformer2DModel top-level keys
# (diffusers/models/transformers/transformer_sd3.py; behavior parity
# with the reference's SD3-style TE stack, duwu/modules/
# text_encoders.py:290-297 — the reference itself has no MMDiT).
# ``pos_embed.pos_embed`` (the baked positional grid) is skipped: ours
# is recomputed, incl. the 192-grid center-crop convention
# (models/mmdit.py::pos_embed_max_size).
_MMDIT_TOP_RULES: list[tuple[str, str, Callable]] = [
    (r"^patch_embed/kernel$", "pos_embed.proj.weight", _t_conv),
    (r"^patch_embed/bias$", "pos_embed.proj.bias", _identity),
    (r"^context_embedder/kernel$", "context_embedder.weight", _t_linear),
    (r"^context_embedder/bias$", "context_embedder.bias", _identity),
    (r"^t_fc1/kernel$",
     "time_text_embed.timestep_embedder.linear_1.weight", _t_linear),
    (r"^t_fc1/bias$",
     "time_text_embed.timestep_embedder.linear_1.bias", _identity),
    (r"^t_fc2/kernel$",
     "time_text_embed.timestep_embedder.linear_2.weight", _t_linear),
    (r"^t_fc2/bias$",
     "time_text_embed.timestep_embedder.linear_2.bias", _identity),
    (r"^pool_fc1/kernel$",
     "time_text_embed.text_embedder.linear_1.weight", _t_linear),
    (r"^pool_fc1/bias$",
     "time_text_embed.text_embedder.linear_1.bias", _identity),
    (r"^pool_fc2/kernel$",
     "time_text_embed.text_embedder.linear_2.weight", _t_linear),
    (r"^pool_fc2/bias$",
     "time_text_embed.text_embedder.linear_2.bias", _identity),
    # norm_out is AdaLayerNormContinuous: scale-first -> swap halves
    (r"^final_modulation/kernel$",
     "norm_out.linear.weight", _t_swap_halves_linear),
    (r"^final_modulation/bias$", "norm_out.linear.bias", _swap_halves),
    (r"^final_proj/kernel$", "proj_out.weight", _t_linear),
    (r"^final_proj/bias$", "proj_out.bias", _identity),
]

# within-block leaves (path relative to the block): attn1 = image
# stream (attn.to_*), attn2 = context stream (attn.add_*_proj /
# to_add_out / norm_added_*), mlp_x/mlp_ctx = ff / ff_context
_MMDIT_BLOCK_LEAVES: list[tuple[str, str, Callable]] = [
    (r"^adaLN_x/kernel$", "norm1.linear.weight", _t_linear),
    (r"^adaLN_x/bias$", "norm1.linear.bias", _identity),
    (r"^adaLN_ctx/kernel$", "norm1_context.linear.weight", _t_linear),
    (r"^adaLN_ctx/bias$", "norm1_context.linear.bias", _identity),
    (r"^attn1/to_(q|k|v)/kernel$", r"attn.to_\1.weight", _t_linear),
    (r"^attn1/to_(q|k|v)/bias$", r"attn.to_\1.bias", _identity),
    (r"^attn1/to_out/kernel$", "attn.to_out.0.weight", _t_linear),
    (r"^attn1/to_out/bias$", "attn.to_out.0.bias", _identity),
    (r"^attn1/norm_(q|k)/scale$", r"attn.norm_\1.weight", _identity),
    (r"^attn2/to_q/kernel$", "attn.add_q_proj.weight", _t_linear),
    (r"^attn2/to_q/bias$", "attn.add_q_proj.bias", _identity),
    (r"^attn2/to_k/kernel$", "attn.add_k_proj.weight", _t_linear),
    (r"^attn2/to_k/bias$", "attn.add_k_proj.bias", _identity),
    (r"^attn2/to_v/kernel$", "attn.add_v_proj.weight", _t_linear),
    (r"^attn2/to_v/bias$", "attn.add_v_proj.bias", _identity),
    (r"^attn2/to_out/kernel$", "attn.to_add_out.weight", _t_linear),
    (r"^attn2/to_out/bias$", "attn.to_add_out.bias", _identity),
    (r"^attn2/norm_(q|k)/scale$", r"attn.norm_added_\1.weight", _identity),
    (r"^mlp_x/fc1/kernel$", "ff.net.0.proj.weight", _t_linear),
    (r"^mlp_x/fc1/bias$", "ff.net.0.proj.bias", _identity),
    (r"^mlp_x/fc2/kernel$", "ff.net.2.weight", _t_linear),
    (r"^mlp_x/fc2/bias$", "ff.net.2.bias", _identity),
    (r"^mlp_ctx/fc1/kernel$", "ff_context.net.0.proj.weight", _t_linear),
    (r"^mlp_ctx/fc1/bias$", "ff_context.net.0.proj.bias", _identity),
    (r"^mlp_ctx/fc2/kernel$", "ff_context.net.2.weight", _t_linear),
    (r"^mlp_ctx/fc2/bias$", "ff_context.net.2.bias", _identity),
]


def mmdit_key_map(our_path: str, depth: int | None = None):
    """``models/mmdit.py::MMDiT`` paths -> diffusers
    ``SD3Transformer2DModel`` state-dict keys (the released SD3/SD3.5
    checkpoints). ``depth`` resolves the heterogeneous ``final_block``
    (``context_pre_only``) to its torch index ``depth - 1``; its
    ``adaLN_ctx`` mirrors AdaLayerNormContinuous's scale-first chunk
    order directly, so (unlike the shift-first ``final_modulation``
    head) no halves swap. MoE variants have no torch counterpart and
    raise KeyError (use strict=False)."""
    for pat, repl, tr in _MMDIT_TOP_RULES:
        if re.match(pat, our_path):
            return re.sub(pat, repl, our_path), tr
    m = re.match(r"^(blocks_(\d+)|final_block)/(.*)$", our_path)
    if m:
        if m.group(1) == "final_block":
            if depth is None:
                raise KeyError(
                    f"mmdit_key_map needs depth= to place {our_path!r} "
                    "(final_block maps to transformer_blocks.depth-1)"
                )
            idx = depth - 1
        else:
            idx = int(m.group(2))
        rest = m.group(3)
        for pat, repl, tr in _MMDIT_BLOCK_LEAVES:
            if re.match(pat, rest):
                # final_block's adaLN_ctx IS scale-first in the flax
                # block too (it mirrors AdaLayerNormContinuous
                # directly), so no halves swap — only the shift-first
                # head (final_modulation above) needs one
                return (
                    f"transformer_blocks.{idx}." + re.sub(pat, repl, rest),
                    tr,
                )
    raise KeyError(f"no torch mapping for MMDiT param {our_path!r}")


# diffusers FluxTransformer2DModel top-level keys. The double-stream
# blocks share the SD3 JointTransformerBlock leaf names exactly
# (_MMDIT_BLOCK_LEAVES); Flux's norm_out is AdaLayerNormContinuous
# (scale-first) and models/flux.py's final head is ALSO scale-first,
# so no halves swap (unlike MMDiT's shift-first DiT-convention head).
_FLUX_TOP_RULES: list[tuple[str, str, Callable]] = [
    (r"^x_embedder/kernel$", "x_embedder.weight", _t_linear),
    (r"^x_embedder/bias$", "x_embedder.bias", _identity),
    (r"^context_embedder/kernel$", "context_embedder.weight", _t_linear),
    (r"^context_embedder/bias$", "context_embedder.bias", _identity),
    (r"^t_fc1/kernel$",
     "time_text_embed.timestep_embedder.linear_1.weight", _t_linear),
    (r"^t_fc1/bias$",
     "time_text_embed.timestep_embedder.linear_1.bias", _identity),
    (r"^t_fc2/kernel$",
     "time_text_embed.timestep_embedder.linear_2.weight", _t_linear),
    (r"^t_fc2/bias$",
     "time_text_embed.timestep_embedder.linear_2.bias", _identity),
    (r"^g_fc1/kernel$",
     "time_text_embed.guidance_embedder.linear_1.weight", _t_linear),
    (r"^g_fc1/bias$",
     "time_text_embed.guidance_embedder.linear_1.bias", _identity),
    (r"^g_fc2/kernel$",
     "time_text_embed.guidance_embedder.linear_2.weight", _t_linear),
    (r"^g_fc2/bias$",
     "time_text_embed.guidance_embedder.linear_2.bias", _identity),
    (r"^pool_fc1/kernel$",
     "time_text_embed.text_embedder.linear_1.weight", _t_linear),
    (r"^pool_fc1/bias$",
     "time_text_embed.text_embedder.linear_1.bias", _identity),
    (r"^pool_fc2/kernel$",
     "time_text_embed.text_embedder.linear_2.weight", _t_linear),
    (r"^pool_fc2/bias$",
     "time_text_embed.text_embedder.linear_2.bias", _identity),
    (r"^final_modulation/kernel$", "norm_out.linear.weight", _t_linear),
    (r"^final_modulation/bias$", "norm_out.linear.bias", _identity),
    (r"^final_proj/kernel$", "proj_out.weight", _t_linear),
    (r"^final_proj/bias$", "proj_out.bias", _identity),
]

# single-stream block leaves (diffusers FluxSingleTransformerBlock):
# one pre-norm modulation, q/k/v with per-head RMSNorm (no to_out),
# parallel proj_mlp, fused proj_out
_FLUX_SINGLE_LEAVES: list[tuple[str, str, Callable]] = [
    (r"^adaLN/kernel$", "norm.linear.weight", _t_linear),
    (r"^adaLN/bias$", "norm.linear.bias", _identity),
    (r"^attn1/to_(q|k|v)/kernel$", r"attn.to_\1.weight", _t_linear),
    (r"^attn1/to_(q|k|v)/bias$", r"attn.to_\1.bias", _identity),
    (r"^attn1/norm_(q|k)/scale$", r"attn.norm_\1.weight", _identity),
    (r"^proj_mlp/kernel$", "proj_mlp.weight", _t_linear),
    (r"^proj_mlp/bias$", "proj_mlp.bias", _identity),
    (r"^proj_out/kernel$", "proj_out.weight", _t_linear),
    (r"^proj_out/bias$", "proj_out.bias", _identity),
]


def flux_key_map(our_path: str):
    """``models/flux.py::Flux`` paths -> diffusers
    ``FluxTransformer2DModel`` state-dict keys (the released
    flux-dev/schnell checkpoints). Double-stream blocks reuse the SD3
    joint-block leaf names; single-stream blocks map here. schnell
    (guidance_embeds=False) simply has no ``g_fc*`` leaves on either
    side."""
    for pat, repl, tr in _FLUX_TOP_RULES:
        if re.match(pat, our_path):
            return re.sub(pat, repl, our_path), tr
    m = re.match(r"^single_blocks_(\d+)/(.*)$", our_path)
    if m:
        idx, rest = int(m.group(1)), m.group(2)
        for pat, repl, tr in _FLUX_SINGLE_LEAVES:
            if re.match(pat, rest):
                return (
                    f"single_transformer_blocks.{idx}."
                    + re.sub(pat, repl, rest),
                    tr,
                )
    m = re.match(r"^blocks_(\d+)/(.*)$", our_path)
    if m:
        idx, rest = int(m.group(1)), m.group(2)
        for pat, repl, tr in _MMDIT_BLOCK_LEAVES:
            if re.match(pat, rest):
                return (
                    f"transformer_blocks.{idx}." + re.sub(pat, repl, rest),
                    tr,
                )
    raise KeyError(f"no torch mapping for Flux param {our_path!r}")


def dit_key_map(our_path: str):
    """``models/dit.py::DiT`` paths -> facebookresearch-DiT torch keys
    (scanned ``blocks`` stacks go through the generic per-layer
    machinery in import/export_params). RoPE/MoE variants have no torch
    counterpart and raise KeyError (use strict=False to keep their
    initialized leaves)."""
    for pat, repl, tr in _DIT_RULES:
        m = re.match(pat, our_path)
        if m:
            key = re.sub(pat, repl, our_path)
            if "{leaf}" in key:
                leaf = "weight" if our_path.endswith("kernel") else "bias"
                key = key.replace("{leaf}", leaf)
            return key, tr
    raise KeyError(f"no torch mapping for DiT param {our_path!r}")


# ControlNet-only modules (models/controlnet.py); the trunk reuses the
# UNet rules — diffusers' ControlNetModel keeps the UNet encoder names.
# diffusers' conditioning embedding: conv_in, blocks.{2k}=ch_k->ch_k,
# blocks.{2k+1}=ch_k->ch_{k+1} stride 2, conv_out (zero-init) — our
# cond_embed_in / cond_embed_{k}a / cond_embed_{k}b / cond_embed_out.
_CONTROLNET_RULES: list[tuple[str, str, Callable]] = [
    (r"^cond_embed_in/kernel$",
     "controlnet_cond_embedding.conv_in.weight", _t_conv),
    (r"^cond_embed_in/bias$",
     "controlnet_cond_embedding.conv_in.bias", _identity),
    (r"^cond_embed_out/kernel$",
     "controlnet_cond_embedding.conv_out.weight", _t_conv),
    (r"^cond_embed_out/bias$",
     "controlnet_cond_embedding.conv_out.bias", _identity),
    (r"^controlnet_mid/kernel$", "controlnet_mid_block.weight", _t_conv),
    (r"^controlnet_mid/bias$", "controlnet_mid_block.bias", _identity),
]


def controlnet_key_map(our_path: str, use_linear_projection: bool = True):
    """``models/controlnet.py`` paths -> diffusers ``ControlNetModel``
    keys. The trunk (conv_in/time/add embeddings/down_*/mid_*) shares
    the UNet rules; hint encoder and zero-conv heads map here."""
    for pat, repl, tr in _CONTROLNET_RULES:
        if re.match(pat, our_path):
            return re.sub(pat, repl, our_path), tr
    m = re.match(r"^cond_embed_(\d+)([ab])/(kernel|bias)$", our_path)
    if m:
        k, half, leaf = int(m.group(1)), m.group(2), m.group(3)
        idx = 2 * k + (1 if half == "b" else 0)
        suffix = "weight" if leaf == "kernel" else "bias"
        tr = _t_conv if leaf == "kernel" else _identity
        return f"controlnet_cond_embedding.blocks.{idx}.{suffix}", tr
    m = re.match(r"^controlnet_down_(\d+)/(kernel|bias)$", our_path)
    if m:
        k, leaf = int(m.group(1)), m.group(2)
        suffix = "weight" if leaf == "kernel" else "bias"
        tr = _t_conv if leaf == "kernel" else _identity
        return f"controlnet_down_blocks.{k}.{suffix}", tr
    return unet_key_map(our_path, use_linear_projection)


def t5_key_map(our_path: str):
    """T5EncoderModel paths -> HF ``transformers.T5EncoderModel`` keys
    (the SD3-style third TE, ``duwu/modules/text_encoders.py:290-297``)."""
    for pat, repl, tr in _T5_RULES:
        if re.match(pat, our_path):
            return re.sub(pat, repl, our_path), tr
    raise KeyError(f"no torch mapping for T5 param {our_path!r}")


_CLIP_VISION_RULES = [
    (r"^patch_embedding/kernel$",
     "vision_model.embeddings.patch_embedding.weight", _t_conv),
    (r"^class_embedding$",
     "vision_model.embeddings.class_embedding", _identity),
    (r"^position_embedding$",
     "vision_model.embeddings.position_embedding.weight", _identity),
    # NOTE: "pre_layrnorm" is the (misspelled) HF transformers key
    (r"^pre_layernorm/scale$", "vision_model.pre_layrnorm.weight", _identity),
    (r"^pre_layernorm/bias$", "vision_model.pre_layrnorm.bias", _identity),
    (r"^post_layernorm/scale$",
     "vision_model.post_layernorm.weight", _identity),
    (r"^post_layernorm/bias$", "vision_model.post_layernorm.bias", _identity),
    (r"^visual_projection/kernel$", "visual_projection.weight", _t_linear),
    (r"^layers_(\d+)/layer_norm(\d)/scale$",
     r"vision_model.encoder.layers.\1.layer_norm\2.weight", _identity),
    (r"^layers_(\d+)/layer_norm(\d)/bias$",
     r"vision_model.encoder.layers.\1.layer_norm\2.bias", _identity),
    (r"^layers_(\d+)/(q|k|v|out)_proj/kernel$",
     r"vision_model.encoder.layers.\1.self_attn.\2_proj.weight", _t_linear),
    (r"^layers_(\d+)/(q|k|v|out)_proj/bias$",
     r"vision_model.encoder.layers.\1.self_attn.\2_proj.bias", _identity),
    (r"^layers_(\d+)/fc(\d)/kernel$",
     r"vision_model.encoder.layers.\1.mlp.fc\2.weight", _t_linear),
    (r"^layers_(\d+)/fc(\d)/bias$",
     r"vision_model.encoder.layers.\1.mlp.fc\2.bias", _identity),
]


def clip_vision_key_map(our_path: str):
    """CLIPVisionModel paths -> HF ``CLIPVisionModelWithProjection`` keys
    (the CLIP-score tower, ``duwu/metrics/clip.py:8-33``)."""
    for pat, repl, tr in _CLIP_VISION_RULES:
        if re.match(pat, our_path):
            return re.sub(pat, repl, our_path), tr
    raise KeyError(f"no torch mapping for CLIP-vision param {our_path!r}")


# Inception-v3: our BasicConv2d {conv/kernel, bn/{scale,bias,mean,var}}
# maps 1:1 onto torchvision/torch-fidelity {conv.weight,
# bn.{weight,bias,running_mean,running_var}} under the same module path.
_INCEPTION_LEAVES = [
    (r"conv/kernel$", "conv.weight", _t_conv),
    (r"bn/scale$", "bn.weight", _identity),
    (r"bn/bias$", "bn.bias", _identity),
    (r"bn/mean$", "bn.running_mean", _identity),
    (r"bn/var$", "bn.running_var", _identity),
]


def inception_key_map(our_path: str):
    """InceptionV3Features paths -> torchvision ``inception_v3`` /
    torch-fidelity ``pt_inception-2015-12-05`` state-dict keys
    (the torchmetrics FID backbone, ``duwu/metrics/fid.py:17-41``)."""
    for suffix, torch_suffix, tr in _INCEPTION_LEAVES:
        m = re.search(suffix, our_path)
        if m:
            prefix = our_path[: m.start()].replace("/", ".")
            return prefix + torch_suffix, tr
    raise KeyError(f"no torch mapping for Inception param {our_path!r}")


_VAE_RULES = [
    (r"^quant_conv/kernel$", "quant_conv.weight", _t_conv),
    (r"^quant_conv/bias$", "quant_conv.bias", _identity),
    (r"^post_quant_conv/kernel$", "post_quant_conv.weight", _t_conv),
    (r"^post_quant_conv/bias$", "post_quant_conv.bias", _identity),
    (r"^(encoder|decoder)/conv_in/", r"\1.conv_in.", None),
    (r"^(encoder|decoder)/conv_out/", r"\1.conv_out.", None),
    (r"^(encoder|decoder)/conv_norm_out/", r"\1.conv_norm_out.", None),
    (r"^encoder/down_(\d+)_res_(\d+)/", r"encoder.down_blocks.\1.resnets.\2.",
     None),
    (r"^encoder/down_(\d+)_downsample/conv/",
     r"encoder.down_blocks.\1.downsamplers.0.conv.", None),
    (r"^decoder/up_(\d+)_res_(\d+)/", r"decoder.up_blocks.\1.resnets.\2.",
     None),
    (r"^decoder/up_(\d+)_upsample/conv/",
     r"decoder.up_blocks.\1.upsamplers.0.conv.", None),
    (r"^(encoder|decoder)/mid_res_(\d+)/", r"\1.mid_block.resnets.\2.", None),
    (r"^(encoder|decoder)/mid_attn/", r"\1.mid_block.attentions.0.", None),
]

_VAE_LEAF_RULES = _LEAF_RULES + [
    (r"(.*\.)group_norm/scale$", r"\1group_norm.weight", _identity),
    (r"(.*\.)group_norm/bias$", r"\1group_norm.bias", _identity),
    (r"(.*\.)to_(q|k|v|out)/kernel$", r"\1to_\2.weight", _t_linear),
    (r"(.*\.)to_(q|k|v)/bias$", r"\1to_\2.bias", _identity),
    (r"(.*\.)to_out/bias$", r"\1to_out.0.bias", _identity),
    (r"(.*\.)conv_in\.kernel$", r"\1conv_in.weight", _t_conv),
]


def vae_key_map(our_path: str):
    path = our_path
    for pat, repl, tr in _VAE_RULES:
        if re.match(pat, path):
            if repl.endswith("."):
                path = re.sub(pat, repl, path)
                break
            return re.sub(pat, repl, path), tr
    # VAE mid attention naming: ours to_out maps to to_out.0; norm -> group_norm
    path = path.replace("norm/scale", "group_norm/scale").replace(
        "norm/bias", "group_norm/bias"
    ) if ".attentions." in path else path
    for pat, repl, tr in _VAE_LEAF_RULES:
        m = re.match(pat, path)
        if m:
            key = re.sub(pat, repl, path)
            if key.endswith("to_out.weight"):
                key = key.replace("to_out.weight", "to_out.0.weight")
            return key, tr or _t_conv
    # plain conv/norm leaves after prefix rewrite (conv_in.kernel etc.);
    # the separator is "." once a block-prefix rule rewrote the path
    for suffix, torch_suffix, tr in [
        ("kernel", "weight", _t_conv),
        ("scale", "weight", _identity),
        ("bias", "bias", _identity),
    ]:
        if path.endswith("/" + suffix) or path.endswith("." + suffix):
            return (
                path[: -len(suffix) - 1].replace("/", ".") + "." + torch_suffix,
                tr,
            )
    raise KeyError(f"no torch mapping for VAE param {our_path!r}")


def stack_block_params(params: Any) -> Any:
    """Convert unrolled transformer-block params (``blocks_0..blocks_N``)
    to the ``nn.scan`` layout (one ``blocks`` subtree with a leading
    layer axis). Lets checkpoints/imports produced in the unscanned
    layout load into a ``scan_transformer_blocks=True`` model."""

    def convert(node):
        if not isinstance(node, dict):
            return node
        node = {k: convert(v) for k, v in node.items()}
        for prefix in ("blocks", "single_blocks"):
            idx = sorted(
                (int(k.rsplit("_", 1)[-1]), k)
                for k in node
                if re.fullmatch(rf"{prefix}_\d+", k)
            )
            # 1-layer stacks stay unrolled in the model
            # (Transformer2DModel only scans num_layers > 1), so only
            # stack >= 2 blocks
            if len(idx) > 1 and [i for i, _ in idx] == list(range(len(idx))):
                stacked = jax.tree_util.tree_map(
                    lambda *xs: np.stack([np.asarray(x) for x in xs]),
                    *[node[k] for _, k in idx],
                )
                for _, k in idx:
                    del node[k]
                node[prefix] = stacked
        return node

    return convert(params)


def unstack_block_params(params: Any, to_numpy: bool = True) -> Any:
    """Inverse of :func:`stack_block_params` (for exporting scanned
    checkpoints back to the diffusers-compatible unrolled layout)."""

    def convert(node):
        if not isinstance(node, dict):
            return node
        node = {k: convert(v) for k, v in node.items()}
        for prefix in ("blocks", "single_blocks"):
            if prefix in node and isinstance(node[prefix], dict):
                stacked = node.pop(prefix)
                leaves = jax.tree_util.tree_leaves(stacked)
                if leaves:
                    n = int(leaves[0].shape[0])
                    for i in range(n):
                        node[f"{prefix}_{i}"] = jax.tree_util.tree_map(
                            lambda x: np.asarray(x)[i] if to_numpy else x[i],
                            stacked,
                        )
        return node

    return convert(params)


# an nn.scan layer stack: a `blocks` subtree either nested (UNet
# Transformer2DModel: ".../blocks/...") or at the tree root (DiT/MMDiT:
# "blocks/..."); Flux adds a second root-level `single_blocks` stack
_SCAN_STACK_RE = re.compile(r"(^|/)(single_)?blocks/")


def _unroll_path(our: str, i: int) -> str:
    """``.../blocks/leaf`` -> ``.../blocks_i/leaf`` (layer ``i`` of a
    scanned stack), handling the root-level ``blocks/`` and
    ``single_blocks/`` spellings."""
    return _SCAN_STACK_RE.sub(rf"\g<1>\g<2>blocks_{i}/", our, count=1)


def _inv_linear(w):  # [in, out] -> [out, in]
    return np.transpose(np.asarray(w), (1, 0))


def _inv_conv(w):  # HWIO -> OIHW
    return np.transpose(np.asarray(w), (3, 2, 0, 1))


def export_params(
    params: Any,
    key_map: Callable[[str], tuple[str, Callable]],
    dtype=np.float32,
) -> dict[str, np.ndarray]:
    """Inverse of :func:`import_params`: a flax param tree -> a
    torch/diffusers-layout state dict (numpy arrays), so checkpoints
    trained here round-trip back into the reference's ecosystem
    (diffusers ``save_pretrained`` layouts, ComfyUI, etc.). Every
    transform in the key maps is a bijection: linear transpose, conv
    HWIO<->OIHW, identity, and the fused-projection concat (split back
    into its per-tensor torch keys). Scanned ``/blocks/`` stacks export
    per layer index."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out: dict[str, np.ndarray] = {}
    # _SplitLinear leaves: several flax leaves concatenate back into one
    # torch tensor (e.g. q/k/v -> fused qkv.weight)
    pending: dict[str, list] = {}

    def emit(our, torch_key, tr, w):
        w = np.asarray(w)
        # np.astype(order='K') preserves the source's (transposed)
        # memory layout, and safetensors.numpy silently serializes the
        # RAW buffer of an F-contiguous array under its C-order shape —
        # every emitted tensor must be C-contiguous or a user calling
        # save_file(export_params(...)) writes corrupt weights.
        if isinstance(torch_key, (list, tuple)):  # fused concat -> split
            parts = np.split(w, len(torch_key), axis=-1)
            for tk, part in zip(torch_key, parts):
                out[tk] = np.ascontiguousarray(_inv_linear(part).astype(dtype))
            return
        if isinstance(tr, _SplitLinear):
            parts = pending.setdefault(torch_key, [None] * tr.n)
            parts[tr.j] = np.ascontiguousarray(tr.inverse_part(w).astype(dtype))
            return
        if tr == "proj":
            tr = _t_conv if w.ndim == 4 else _t_linear
        if tr is _t_linear:
            out[torch_key] = np.ascontiguousarray(_inv_linear(w).astype(dtype))
        elif tr is _t_conv:
            out[torch_key] = np.ascontiguousarray(_inv_conv(w).astype(dtype))
        elif tr is _t_swap_halves_linear:
            # inverse of (swap output halves, transpose)
            out[torch_key] = np.ascontiguousarray(_swap_halves(_inv_linear(w)).astype(dtype))
        elif tr is _swap_halves:  # self-inverse
            out[torch_key] = np.ascontiguousarray(_swap_halves(w).astype(dtype))
        elif tr is _identity:
            out[torch_key] = np.ascontiguousarray(w.astype(dtype))
        else:
            raise ValueError(
                f"no inverse for transform {tr!r} of {our} -> {torch_key}"
            )

    for path, leaf in flat:
        our = "/".join(str(getattr(p, "key", p)) for p in path)
        if _SCAN_STACK_RE.search(our):  # nn.scan stack: per-layer entries
            arr = np.asarray(leaf)
            for i in range(int(arr.shape[0])):
                torch_key, tr = key_map(_unroll_path(our, i))
                emit(our, torch_key, tr, arr[i])
            continue
        torch_key, tr = key_map(our)
        emit(our, torch_key, tr, leaf)
    for torch_key, parts in pending.items():
        if any(p is None for p in parts):
            raise ValueError(
                f"incomplete fused export for {torch_key}: missing parts"
            )
        out[torch_key] = np.concatenate(parts, axis=0)
    return out


def import_params(
    target_params: Any,
    state_dict: dict[str, np.ndarray],
    key_map: Callable[[str], tuple[str, Callable]],
    strict: bool = True,
) -> Any:
    """Fill ``target_params``-shaped tree from a torch state dict."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(target_params)
    leaves = []
    missing = []

    def fetch(torch_key, tr):
        """Resolve one key_map result to an array, or None if absent.
        ``torch_key`` may be a list (fused projections: several torch
        tensors gathered into one flax kernel)."""
        if isinstance(torch_key, (list, tuple)):
            ws = []
            for tk in torch_key:
                if tk not in state_dict:
                    return None
                ws.append(np.asarray(state_dict[tk]))
            return tr(ws)
        if torch_key not in state_dict:
            return None
        w = np.asarray(state_dict[torch_key])
        if tr == "proj":  # conv1x1 [O,I,1,1] or linear [O,I]
            tr = _t_conv if w.ndim == 4 else _t_linear
        return tr(w)

    for path, leaf in flat:
        our = "/".join(
            str(getattr(p, "key", p)) for p in path
        )
        if _SCAN_STACK_RE.search(our):
            # nn.scan layout (scan_transformer_blocks=True): the leaf
            # carries a leading layer axis; import each layer through the
            # per-index key and stack
            n_layers = int(leaf.shape[0])
            per_layer = []
            for i in range(n_layers):
                try:
                    torch_key, tr = key_map(_unroll_path(our, i))
                except KeyError:
                    if strict:
                        raise
                    break  # unmapped subtree: keep the initialized leaf
                w = fetch(torch_key, tr)
                if w is None:
                    break
                per_layer.append(w)
            if len(per_layer) == n_layers:
                w = np.stack(per_layer)
                if tuple(w.shape) != tuple(leaf.shape):
                    raise ValueError(
                        f"shape mismatch for {our}: {w.shape} vs {leaf.shape}"
                    )
                leaves.append(w.astype(np.asarray(leaf).dtype))
            else:
                missing.append(our)
                leaves.append(leaf)
            continue
        try:
            torch_key, tr = key_map(our)
        except KeyError:
            if strict:
                raise
            leaves.append(leaf)
            continue
        w = fetch(torch_key, tr)
        if w is None:
            missing.append(torch_key)
            leaves.append(leaf)
            continue
        if tuple(w.shape) != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch for {our} <- {torch_key}: "
                f"{w.shape} vs {leaf.shape}"
            )
        leaves.append(w.astype(np.asarray(leaf).dtype))
    if strict and missing:
        raise KeyError(f"missing torch keys: {missing[:10]}...")
    return jax.tree_util.tree_unflatten(treedef, leaves)
