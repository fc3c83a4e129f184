"""Multi-text-encoder conditioning stack.

Capability parity with ``duwu/modules/text_encoders.py``: N tokenizers +
N text models, each with a ``TextModelExtraConfig`` (concat bucket,
use_pooled, layer_idx, need_mask); per-bucket feature-dim concat,
cross-bucket seq concat with feature padding; pooled concat; optional
zero-out of padding positions; ragged multi-caption ("nested") encoding
via the fixed-shape aggregation ops.

TPU-first split: ``ConcatTextEncoders`` is a pure flax module taking
fixed-shape tokenizer outputs (device side, jittable);
``TextEncodingPipeline`` holds the host-side tokenizers + params and
provides the reference's ``encode(text, nested=...)`` convenience.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from uwudiff_tpu.models.clip import CLIPTextModel, CLIPTextOutput
from uwudiff_tpu.models.t5 import T5EncoderModel
from uwudiff_tpu.utils import remove_none
from uwudiff_tpu.utils.aggregation import aggregate_embeddings

__all__ = ["TextModelExtraConfig", "ConcatTextEncoders", "TextEncodingPipeline"]


@dataclasses.dataclass(frozen=True)
class TextModelExtraConfig:
    """Per-text-model placement config (``text_encoders.py:29-36``)."""

    concat_bucket: int = 0
    use_pooled: bool = False
    layer_idx: int = -1
    need_mask: bool = False
    # contribute ONLY the pooled vector (Flux-style CLIP-L slot: the
    # sequence features stay out of the cross/joint-attention context)
    pooled_only: bool = False


def _build_text_model(cfg) -> nn.Module:
    if isinstance(cfg, nn.Module):
        return cfg
    cfg = dict(cfg)
    model_type = cfg.pop("model_type", "clip")
    if model_type == "clip":
        preset = cfg.pop("preset", None)
        return CLIPTextModel.from_config(preset, **cfg) if preset else CLIPTextModel(**cfg)
    if model_type == "t5":
        preset = cfg.pop("preset", None)
        return (
            T5EncoderModel.from_config(preset, **cfg) if preset else T5EncoderModel(**cfg)
        )
    raise ValueError(f"Unknown text model_type {model_type!r}")


class ConcatTextEncoders(nn.Module):
    """Run every text model and assemble conditioning tensors.

    Returns ``(embedding, normed_embedding, pooled, attn_mask)`` with the
    exact bucket semantics of ``text_encoders.py:139-264``:

    SDXL: CLIP-L + CLIP-bigG feature-concat in bucket 0, both pooled.
    SD3-style: + T5 in bucket 1 (seq-concat after feature padding).
    """

    text_models: Sequence[nn.Module]
    configs: Sequence[TextModelExtraConfig]
    zero_for_padding: bool = True
    use_normed_ctx: bool = False
    # zero-pad the assembled context's feature dim to this width — the
    # SD3 "no-T5" mode feeds the 2048-wide CLIP-pair features into the
    # checkpoint's 4096-wide context_embedder by zero-padding (the same
    # padding the T5 bucket would have forced)
    pad_context_to: int | None = None

    @classmethod
    def from_config(
        cls,
        text_model_and_configs: Sequence[tuple],
        zero_for_padding: bool = True,
        use_normed_ctx: bool = False,
        pad_context_to: int | None = None,
    ) -> "ConcatTextEncoders":
        models, configs = [], []
        for model_cfg, extra_cfg in text_model_and_configs:
            models.append(_build_text_model(model_cfg))
            if not isinstance(extra_cfg, TextModelExtraConfig):
                extra_cfg = TextModelExtraConfig(**extra_cfg)
            configs.append(extra_cfg)
        return cls(
            text_models=tuple(models),
            configs=tuple(configs),
            zero_for_padding=zero_for_padding,
            use_normed_ctx=use_normed_ctx,
            pad_context_to=pad_context_to,
        )

    @property
    def max_bucket(self) -> int:
        return max(c.concat_bucket for c in self.configs)

    @nn.compact
    def __call__(
        self, tokenizer_outputs: Sequence[dict[str, jnp.ndarray]]
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray | None, jnp.ndarray | None]:
        n_buckets = self.max_bucket + 1
        attn_masks: list = [None] * n_buckets
        text_embeddings: list = [[] for _ in range(n_buckets)]
        normed_text_embeddings: list = [[] for _ in range(n_buckets)]
        pooled_text_embeddings: list = [[] for _ in range(n_buckets)]

        for tokens, text_model, config in zip(
            tokenizer_outputs, self.text_models, self.configs
        ):
            input_ids = tokens["input_ids"]
            attn_mask = tokens["attention_mask"]
            bucket = config.concat_bucket
            if (
                attn_masks[bucket] is None
                and config.need_mask
                and not config.pooled_only
            ):
                attn_masks[bucket] = attn_mask

            if isinstance(text_model, CLIPTextModel):
                b, s = input_ids.shape
                win = text_model.max_position_embeddings
                if s > win:
                    # long-prompt windows (``models/long_prompt.py``):
                    # [B, n*win] -> [B*n, win], one encoder pass with the
                    # batch axis carrying the windows, hidden states
                    # seq-concat back; pooled = FIRST window's pooled.
                    if s % win:
                        raise ValueError(
                            f"sequence {s} is not a multiple of the CLIP "
                            f"window {win} — tokenize long prompts with "
                            "tokenize_long/encode(long_prompt=True)"
                        )
                    n = s // win
                    out: CLIPTextOutput = text_model(
                        input_ids.reshape(b * n, win),
                        attn_mask.reshape(b * n, win),
                        layer_idx=config.layer_idx,
                    )
                    embedding = out.embedding.reshape(b, s, -1)
                    normed_embedding = out.normed_embedding.reshape(b, s, -1)
                    pooled = out.pooler_output.reshape(b, n, -1)[:, 0]
                else:
                    out = text_model(
                        input_ids, attn_mask, layer_idx=config.layer_idx
                    )
                    embedding = out.embedding
                    normed_embedding = out.normed_embedding
                    pooled = out.pooler_output
            else:  # T5-style: last hidden state, no pooled
                out = text_model(input_ids, attn_mask)
                embedding = out.last_hidden_state
                normed_embedding = out.last_hidden_state
                pooled = None

            if self.zero_for_padding:
                m = attn_mask[..., None].astype(embedding.dtype)
                embedding = embedding * m
                normed_embedding = normed_embedding * m

            if not config.pooled_only:
                text_embeddings[bucket].append(embedding)
                normed_text_embeddings[bucket].append(normed_embedding)
            if config.use_pooled and pooled is not None:
                pooled_text_embeddings[bucket].append(pooled)

        # per-bucket feature concat
        emb_b, normed_b, pooled_b = [], [], []
        for i in range(n_buckets):
            if not text_embeddings[i]:
                emb_b.append(None)
                normed_b.append(None)
                # a bucket can still contribute pooled vectors when all
                # its models are pooled_only (Flux CLIP-L slot)
                pooled_b.append(
                    jnp.concatenate(pooled_text_embeddings[i], axis=-1)
                    if pooled_text_embeddings[i]
                    else None
                )
                continue
            emb_b.append(jnp.concatenate(text_embeddings[i], axis=-1))
            normed_b.append(jnp.concatenate(normed_text_embeddings[i], axis=-1))
            pooled_b.append(
                jnp.concatenate(pooled_text_embeddings[i], axis=-1)
                if pooled_text_embeddings[i]
                else None
            )

        # pad buckets to max feature dim, then seq-concat buckets
        max_dim = max(e.shape[-1] for e in emb_b if e is not None)
        if self.pad_context_to is not None:
            max_dim = max(max_dim, self.pad_context_to)

        def _pad_feat(e):
            if e is None or e.shape[-1] == max_dim:
                return e
            return jnp.pad(e, [(0, 0), (0, 0), (0, max_dim - e.shape[-1])])

        emb_b = [_pad_feat(e) for e in emb_b]
        normed_b = [_pad_feat(e) for e in normed_b]

        if any(m is not None for m in attn_masks):
            full_masks = []
            for i, e in enumerate(emb_b):
                if e is None:
                    continue
                if attn_masks[i] is None:
                    full_masks.append(
                        jnp.ones(e.shape[:2], dtype=jnp.int32)
                    )
                else:
                    full_masks.append(attn_masks[i].astype(jnp.int32))
            attn_mask_out = jnp.concatenate(full_masks, axis=1)
        else:
            attn_mask_out = None

        pooled_list = remove_none(pooled_b)
        pooled_out = (
            jnp.concatenate(pooled_list, axis=-1) if pooled_list else None
        )

        embedding_out = jnp.concatenate(remove_none(emb_b), axis=1)
        normed_out = jnp.concatenate(remove_none(normed_b), axis=1)
        return embedding_out, normed_out, pooled_out, attn_mask_out


class TextEncodingPipeline:
    """Host-side companion: tokenizers + bound params + nested encoding
    (parity with ``ConcatTextEncoders.tokenize/encode``,
    ``text_encoders.py:95-137``)."""

    def __init__(
        self,
        module: ConcatTextEncoders,
        params: Any,
        tokenizers: Sequence,
        apply_fn=None,
        jit: bool = True,
    ):
        self.module = module
        self.params = params
        self.tokenizers = list(tokenizers)
        self._apply = apply_fn or module.apply
        # jit the TE forward (params as argument -> one compile per
        # token-batch signature, zero retraces on new prompts). Without
        # this, serving paid seconds per request running the CLIP tower
        # EAGERLY — hundreds of per-op round trips over a remote-TPU
        # link (round-3 serve_bench: 9.2s/request vs a 0.7s sampler).
        self._jit_apply = jax.jit(self._apply) if jit else self._apply

    @property
    def use_normed_ctx(self) -> bool:
        return self.module.use_normed_ctx

    def tokenize(self, text, **kwargs):
        return [tok(text, **kwargs) for tok in self.tokenizers]

    def forward(self, tokenizer_outputs):
        tokenizer_outputs = [
            {k: jnp.asarray(v) for k, v in t.items()} for t in tokenizer_outputs
        ]
        return self._jit_apply({"params": self.params}, tokenizer_outputs)

    def encode(
        self,
        text,
        nested: bool = False,
        pad_to_n_elements: int | None = None,
        prompt_weighting: bool = False,
        long_prompt: bool = False,
        max_chunks: int | None = None,
        **kwargs,
    ):
        """str | list[str] | (nested) list[list[str]] -> conditioning.

        Nested mode flattens per-image caption lists, encodes, and packs
        ragged results with the fixed-shape aggregation ops
        (``text_encoders.py:101-137``). ``prompt_weighting=True`` parses
        A1111-style ``(emphasis:1.3)`` syntax and scales token
        embeddings (``models/prompt_weights.py``). ``long_prompt=True``
        chunks prompts beyond the CLIP window into independently encoded
        77-token windows, seq-concatenated (``models/long_prompt.py``);
        the two compose."""
        if long_prompt:
            if nested:
                raise NotImplementedError(
                    "long_prompt with nested caption lists is not supported"
                )
            from uwudiff_tpu.models.long_prompt import encode_long

            return encode_long(
                self, text, max_chunks=max_chunks, weighted=prompt_weighting
            )
        if prompt_weighting:
            if nested:
                raise NotImplementedError(
                    "prompt_weighting with nested caption lists is "
                    "not supported"
                )
            from uwudiff_tpu.models.prompt_weights import encode_weighted

            return encode_weighted(self, text)
        if not nested:
            return self.forward(self.tokenize(text, **kwargs))
        n_captions = [len(t) for t in text]
        flat = [c for per_image in text for c in per_image]
        embs, normed, pools, masks = self.forward(self.tokenize(flat, **kwargs))
        pad_n = pad_to_n_elements or max(n_captions)
        embs = aggregate_embeddings(
            embs, n_captions, mode="concat", pad_to_n_elements=pad_n
        )
        normed = aggregate_embeddings(
            normed, n_captions, mode="concat", pad_to_n_elements=pad_n
        )
        if pools is not None:
            pools = aggregate_embeddings(pools, n_captions, mode="first")
        if masks is not None:
            masks = aggregate_embeddings(
                masks, n_captions, mode="concat", pad_to_n_elements=pad_n
            )
        return embs, normed, pools, masks
