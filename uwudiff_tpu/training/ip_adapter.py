"""IP-Adapter training: frozen UNet/TE, trainable image-prompt path.

Beyond-the-reference capability (see ``models/ip_adapter.py``). The
trainable state is {every to_k_ip/to_v_ip projection inside the UNet's
cross-attentions} + {the image projection} — everything else freezes.
Batches carry ``ip_embeds`` (precomputed CLIP image embeddings [B, D],
the latent-cache philosophy: embedding extraction is preprocessing; use
``models/clip.py``'s vision tower or any embedder). Image-conditioning
dropout (``ip_dropout_prob``) zeroes the embedding per-sample so the
model stays usable without an image prompt (and supports zero-embedding
negative guidance at inference).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from uwudiff_tpu.models.ip_adapter import (
    ImageProjection,
    is_ip_param,
    merge_overlay,
    partition_by_path,
)
from uwudiff_tpu.training.trainer import DMTrainer

__all__ = ["IPAdapterTrainer"]


@dataclasses.dataclass
class IPAdapterTrainer(DMTrainer):
    """Trains the IP-Adapter projections against a frozen model."""

    ip_num_tokens: int = 4
    ip_embed_dim: int = 768  # CLIP image-embedding width
    ip_dropout_prob: float = 0.05

    def __post_init__(self):
        super().__post_init__()
        if self.unet.cross_attention_dim is None:
            raise ValueError(
                "IP-Adapter rides the cross-attention layers — the UNet "
                "must be text-conditional (cross_attention_dim set)"
            )
        if self.lycoris_config is not None:
            raise ValueError(
                "IPAdapterTrainer trains the adapter projections; drop "
                "lycoris_config"
            )
        self.image_proj = ImageProjection(
            cross_attention_dim=self.unet.cross_attention_dim,
            num_tokens=self.ip_num_tokens,
            dtype=self.unet.dtype,
        )
        # pretrained-UNet loading: the init tree contains to_k_ip /
        # to_v_ip leaves no UNet checkpoint has — keep them initialized
        # instead of failing the strict import
        if self._unet_load is not None:
            import dataclasses as _dc

            self._unet_load = _dc.replace(self._unet_load, strict=False)

    def _extra_unet_inputs(self, lat, emb):
        # init the UNet WITH image tokens so the to_k_ip/to_v_ip params
        # exist in the tree
        return {
            "ip_hidden_states": jnp.zeros(
                (lat.shape[0], self.ip_num_tokens,
                 self.unet.cross_attention_dim),
                jnp.float32,
            )
        }

    def _select_trainable_params(
        self, unet_params, frozen, batch, init_args, rng
    ):
        if "class_labels" in batch:
            raise ValueError("IP-Adapter needs a text-conditional model")
        assert "ip_embeds" in batch, (
            "IP-Adapter training needs batches with 'ip_embeds' "
            "(precomputed image embeddings; "
            "DummyDataset(ip_embed_dim=...) for smoke tests)"
        )
        ip_params, _ = partition_by_path(unet_params, is_ip_param)
        # fresh buffers: the trainable tree is DONATED while the full
        # UNet tree stays frozen — sharing buffers trips XLA's donation
        # check (same fix as models/controlnet.py)
        ip_params = jax.tree_util.tree_map(jnp.array, ip_params)
        assert ip_params, (
            "no to_k_ip/to_v_ip params found — the UNet init did not "
            "see ip_hidden_states"
        )
        proj_params = self.image_proj.init(
            rng, jnp.zeros((1, self.ip_embed_dim))
        )["params"]
        frozen["unet"] = unet_params
        return {"unet_ip": ip_params, "image_proj": proj_params}, frozen

    def _loss_for_batch(self, params, frozen, batch, rng):
        if self._has_pipe() or self._is_moe():
            raise ValueError(
                "IPAdapterTrainer supports the plain text-conditional "
                "families (no pipe/MoE)"
            )
        rng_enc, rng_loss, rng_drop = jax.random.split(rng, 3)
        x, ctx, mask, added_cond = self._encode_batch(frozen, batch, rng_enc)

        embeds = jnp.asarray(batch["ip_embeds"])
        if self.ip_dropout_prob > 0:
            keep = (
                jax.random.uniform(rng_drop, (embeds.shape[0], 1))
                >= self.ip_dropout_prob
            )
            embeds = embeds * keep.astype(embeds.dtype)
        tokens = self.image_proj.apply(
            {"params": params["image_proj"]}, embeds
        )

        unet_params = merge_overlay(frozen["unet"], params["unet_ip"])

        def model_fn(noisy, t):
            return self.unet.apply(
                {"params": unet_params},
                noisy, t, ctx, mask, added_cond,
                ip_hidden_states=tokens,
            )

        return self.loss(
            rng_loss, x, model_fn,
            sample_weight=batch.get("loss_weight"),
        )

    def export_ip_adapter(self, path: str):
        """Flat .npz export of the adapter (projections + image proj)."""
        self.export_params(path)
