"""Textual inversion: train ONLY new token embeddings (Gal et al. 2022).

Beyond-the-reference capability completing the personalization family
(full fine-tune / LoRA / ControlNet / textual inversion). The trainable
state is ``num_vectors`` new embedding rows per text encoder; the UNet,
VAE, and every pretrained TE weight stay frozen. One jitted step:
grafted-TE encode (grads flow through the frozen transformer INTO the
new rows), frozen UNet forward, diffusion loss, backward over the rows
only.

Mechanics:
- each text model is rebuilt with ``vocab_size + num_vectors`` (flax
  validates param shapes, so the table must be sized at init); the
  trainable rows overwrite the tail of the frozen table inside the loss
  (``_graft_te_params``).
- the placeholder string is registered on every tokenizer
  (``add_placeholder``) and expands to the new ids — prompts just
  contain e.g. ``"a photo of <concept>"``.
- models pooling by ``argmax(input_ids)`` (CLIP-L convention,
  ``eos_token_id=None``) would mis-pool — the new ids exceed the eos
  id — so the trainer pins ``eos_token_id`` from the tokenizer.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from uwudiff_tpu.training.trainer import DMTrainer

__all__ = ["TextualInversionTrainer"]


@dataclasses.dataclass
class TextualInversionTrainer(DMTrainer):
    """Trains placeholder-token embeddings against a frozen model."""

    placeholder_token: str = "<concept>"
    num_vectors: int = 1
    # seed the new rows from this existing token's embedding (the
    # standard warm start, e.g. "cat"); None -> N(0, 0.02)
    initializer_token: str | None = None

    def __post_init__(self):
        super().__post_init__()
        if self.te is None:
            raise ValueError(
                "textual inversion trains text-token embeddings — "
                "model_config must provide a text encoder"
            )
        if self.lycoris_config is not None:
            raise ValueError(
                "textual inversion trains embeddings only; drop "
                "lycoris_config (stack adapters in a separate run)"
            )
        # enlarge each text model's vocab for the new rows and make
        # argmax-pooling placeholder-safe by pinning the real eos id
        self._base_vocabs = []
        new_models = []
        for tm, tok in zip(self.te.text_models, self.tokenizers):
            self._base_vocabs.append(tm.vocab_size)
            kw = {"vocab_size": tm.vocab_size + self.num_vectors}
            if getattr(tm, "eos_token_id", "x") is None:
                kw["eos_token_id"] = tok.eos_token_id
            new_models.append(dataclasses.replace(tm, **kw))
        self.te = dataclasses.replace(
            self.te, text_models=tuple(new_models)
        )
        # placeholder -> the new ids, per tokenizer
        for vocab, tok in zip(self._base_vocabs, self.tokenizers):
            tok.add_placeholder(
                self.placeholder_token,
                list(range(vocab, vocab + self.num_vectors)),
            )

    def _setup_on_host(self, example_batch: dict):
        # pretrained-TE loading: the checkpoint has base-vocab tables,
        # this trainer's TE is enlarged — import into sliced shapes,
        # then re-attach the (to-be-trained) tail rows
        te_load, self._te_load = self._te_load, None
        try:
            super()._setup_on_host(example_batch)
        finally:
            self._te_load = te_load
        if te_load is not None:
            from uwudiff_tpu.loader import apply_load_config
            from uwudiff_tpu.parallel import fsdp_param_sharding

            te_params = jax.tree_util.tree_map(
                np.asarray, self.frozen["te"]
            )
            sliced = {
                k: dict(v) if isinstance(v, dict) else v
                for k, v in te_params.items()
            }
            for i, vocab in enumerate(self._base_vocabs):
                key = self._emb_key(i)
                emb = dict(sliced[key]["token_embedding"])
                emb["embedding"] = te_params[key]["token_embedding"][
                    "embedding"
                ][:vocab]
                sliced[key] = {**sliced[key], "token_embedding": emb}
            loaded = apply_load_config(sliced, te_load, self.te)
            for i, vocab in enumerate(self._base_vocabs):
                key = self._emb_key(i)
                emb = dict(loaded[key]["token_embedding"])
                emb["embedding"] = np.concatenate(
                    [
                        np.asarray(emb["embedding"]),
                        np.asarray(
                            te_params[key]["token_embedding"]["embedding"]
                        )[vocab:],
                    ]
                )
                loaded[key] = {**loaded[key], "token_embedding": emb}
            frozen = dict(self.frozen)
            frozen["te"] = loaded
            sh = fsdp_param_sharding(frozen, self.mesh)
            self.frozen = jax.device_put(frozen, sh)
            if self.initializer_token is not None:
                # re-seed the trainable rows from the LOADED table —
                # _select_trainable_params ran before the deferred TE
                # load, so it warm-started from the random init
                rows = {}
                for i, (vocab, tok) in enumerate(
                    zip(self._base_vocabs, self.tokenizers)
                ):
                    table = self._te_embedding_leaf(self.frozen["te"], i)
                    init_ids = tok.tokenize(self.initializer_token)
                    rows[self._emb_key(i)] = jnp.tile(
                        table[init_ids[0]][None], (self.num_vectors, 1)
                    )
                rows = jax.device_put(
                    rows,
                    jax.tree_util.tree_map(
                        lambda x: x.sharding, self.state.params
                    ),
                )
                self.state = self.state.replace(
                    params=rows,
                    ema_params=(
                        jax.tree_util.tree_map(jnp.copy, rows)
                        if self.state.ema_params is not None
                        else None
                    ),
                )

    # -- param plumbing -------------------------------------------------

    def _emb_key(self, i: int) -> str:
        return f"text_models_{i}"

    def _te_embedding_leaf(self, te_params, i: int):
        return te_params[self._emb_key(i)]["token_embedding"]["embedding"]

    def _graft_te_params(self, te_params, rows):
        """Frozen TE params with the trainable rows written into the
        tail of each token-embedding table."""
        out = dict(te_params)
        for i, vocab in enumerate(self._base_vocabs):
            key = self._emb_key(i)
            tm = dict(out[key])
            emb = dict(tm["token_embedding"])
            table = emb["embedding"]
            emb["embedding"] = jnp.concatenate(
                [table[:vocab], rows[key].astype(table.dtype)]
            )
            tm["token_embedding"] = emb
            out[key] = tm
        return out

    def _select_trainable_params(
        self, unet_params, frozen, batch, init_args, rng
    ):
        if "class_labels" in batch:
            raise ValueError(
                "textual inversion needs a text-conditional model"
            )
        rows = {}
        for i, (vocab, tok) in enumerate(
            zip(self._base_vocabs, self.tokenizers)
        ):
            table = self._te_embedding_leaf(frozen["te"], i)
            if self.initializer_token is not None:
                init_ids = tok.tokenize(self.initializer_token)
                assert init_ids, (
                    f"initializer token {self.initializer_token!r} "
                    "tokenized to nothing"
                )
                row = table[init_ids[0]]
                rows[self._emb_key(i)] = jnp.tile(
                    row[None], (self.num_vectors, 1)
                )
            else:
                rows[self._emb_key(i)] = (
                    jax.random.normal(
                        jax.random.fold_in(rng, i),
                        (self.num_vectors, table.shape[-1]),
                    )
                    * 0.02
                )
        frozen["unet"] = unet_params
        return rows, frozen

    # -- the loss --------------------------------------------------------

    def _loss_for_batch(self, params, frozen, batch, rng):
        if self._has_pipe() or self._is_moe():
            raise ValueError(
                "textual inversion supports the plain text-conditional "
                "families (no pipe/MoE)"
            )
        rng_enc, rng_loss = jax.random.split(rng)

        if "latent" in batch:
            x = batch["latent"]
        else:
            x = batch["sample"]
            if self.vae is not None:
                dist = self.vae.apply(
                    {"params": frozen["vae"]}, x, method=self.vae.encode
                )
                x = dist.sample(rng_enc)
                x = (x - self.vae_mean) / self.vae_std
        x = jax.lax.stop_gradient(x)

        # grafted TE encode — NO stop_gradient on ctx: the loss
        # backpropagates through the frozen transformer into the rows
        te_params = self._graft_te_params(frozen["te"], params)
        emb, normed, pooled, mask = self.te.apply(
            {"params": te_params}, batch["tokenizer_outputs"]
        )
        ctx = normed if self.te_use_normed_ctx else emb
        added_cond = self._added_cond(batch, pooled)

        def model_fn(noisy, t):
            return self.unet.apply(
                {"params": frozen["unet"]}, noisy, t, ctx, mask, added_cond
            )

        return self.loss(
            rng_loss, x, model_fn,
            sample_weight=batch.get("loss_weight"),
        )

    # -- export / inference ----------------------------------------------

    def grafted_te_params(self):
        """Frozen TE params with the LEARNED rows — plug into
        ``TextEncodingPipeline(trainer.te, ..., trainer.tokenizers)``
        for inference (the tokenizers already expand the placeholder)."""
        return self._graft_te_params(
            self.frozen["te"],
            jax.tree_util.tree_map(jnp.asarray, self.state.params),
        )

    def export_embeddings(self, path: str):
        """npz of the learned rows (``export_params`` handles the
        non-native-dtype cast for bf16 storage)."""
        self.export_params(path)
