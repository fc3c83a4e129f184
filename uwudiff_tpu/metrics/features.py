"""Named feature extractors for the metric harness (configs reference
them by dotted path).

``inception_features`` is the real FID path: the Inception-v3 pool3
tower (``models/inception.py``) with weights imported from a locally
provided torchvision / torch-fidelity checkpoint — the TPU equivalent
of torchmetrics' bundled Inception (``duwu/metrics/fid.py:17-41``).
``clip_vision_features`` backs CLIP-score (``duwu/metrics/clip.py``).
The flatten/downsample extractors remain as weight-free smoke paths.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "flatten_features",
    "downsample_features",
    "clip_vision_features",
    "clip_text_features",
    "inception_features",
]

_TORCH_SUFFIXES = (".pt", ".pth", ".bin", ".safetensors")


def flatten_features(images: jnp.ndarray) -> jnp.ndarray:
    """Identity features: [N, ...] -> [N, prod]. For smoke tests and
    pixel-statistics FID."""
    return images.reshape(images.shape[0], -1)


def downsample_features(images: jnp.ndarray, size: int = 8) -> jnp.ndarray:
    """Cheap perceptual-ish features: average-pool to size x size."""
    import jax

    n, h, w, c = images.shape
    pooled = jax.image.resize(images, (n, size, size, c), method="linear")
    return pooled.reshape(n, -1)


def inception_features(
    params_path: str | None = None,
    fid_variant: bool = True,
    state_dict_key: str | None = None,
    state_dict_prefix: str | None = None,
):
    """Returns a feature_fn: [N,H,W,3] images in [-1,1] (the repo-wide
    ``vae_image_preprocess`` convention) -> [N,2048] Inception-v3 pool3
    features. FID protocol preprocessing: bilinear resize to 299 and
    [-1,1] network input, matching torch-fidelity (resize is affine-
    equivariant, so resizing the already-normalized image is exact).

    ``params_path``: a torch checkpoint (torchvision ``inception_v3`` or
    torch-fidelity ``pt_inception-2015-12-05`` layout) or an .npz param
    export. Without a path the tower is deterministically random-init —
    still a valid metric space for relative comparisons/tests, but NOT
    comparable to published FID numbers.
    """
    import jax

    from uwudiff_tpu.models.inception import FID_INPUT_SIZE, InceptionV3Features

    model = InceptionV3Features(fid_variant=fid_variant)

    def build_params(sample_shape):
        params = model.init(jax.random.PRNGKey(0), jnp.zeros(sample_shape))[
            "params"
        ]
        if params_path and params_path.endswith(_TORCH_SUFFIXES):
            from uwudiff_tpu.models.import_torch import (
                extract_state_dict,
                import_params,
                inception_key_map,
                load_torch_state_dict,
            )

            sd = load_torch_state_dict(params_path)
            sd = extract_state_dict(sd, state_dict_key, state_dict_prefix)
            params = import_params(
                params, sd, inception_key_map, strict=False
            )
        elif params_path:
            from uwudiff_tpu.training.checkpoint import load_params_npz

            params = load_params_npz(params_path, params)
        return params

    state = {}

    def feature_fn(images):
        if "params" not in state:
            state["params"] = build_params(
                (1, FID_INPUT_SIZE, FID_INPUT_SIZE, 3)
            )
        n = images.shape[0]
        # antialias=False: torch-fidelity / torchmetrics resize with
        # plain (non-antialiased) bilinear F.interpolate — the default
        # AA prefilter would shift pool3 features off the protocol
        images = jax.image.resize(
            images.astype(jnp.float32),
            (n, FID_INPUT_SIZE, FID_INPUT_SIZE, images.shape[-1]),
            method="bilinear",
            antialias=False,
        )
        return model.apply({"params": state["params"]}, images)

    return feature_fn


def clip_vision_features(
    preset: str = "tiny",
    params_path: str | None = None,
    state_dict_key: str | None = None,
    state_dict_prefix: str | None = None,
):
    """Returns a feature_fn backed by the CLIP vision tower.

    ``params_path`` may be an .npz param export or a torch checkpoint in
    the HF ``CLIPVisionModelWithProjection`` layout (imported through
    ``clip_vision_key_map``); random init otherwise (smoke tests).
    """
    import jax

    from uwudiff_tpu.models.clip import CLIPVisionModel

    model = CLIPVisionModel.from_config(preset)

    def build_params(sample_shape):
        rng = jax.random.PRNGKey(0)
        params = model.init(rng, jnp.zeros(sample_shape))["params"]
        if params_path and params_path.endswith(_TORCH_SUFFIXES):
            from uwudiff_tpu.models.import_torch import (
                clip_vision_key_map,
                extract_state_dict,
                import_params,
                load_torch_state_dict,
            )

            sd = load_torch_state_dict(params_path)
            sd = extract_state_dict(sd, state_dict_key, state_dict_prefix)
            params = import_params(
                params, sd, clip_vision_key_map, strict=False
            )
        elif params_path:
            from uwudiff_tpu.training.checkpoint import load_params_npz

            params = load_params_npz(params_path, params)
        return params

    state = {}

    def feature_fn(images):
        if "params" not in state:
            state["params"] = build_params((1, *images.shape[1:]))
        return model.apply({"params": state["params"]}, images)

    return feature_fn


def clip_text_features(
    preset: str = "tiny",
    params_path: str | None = None,
    tokenizer=None,
    projection_dim: int | None = None,
    state_dict_key: str | None = None,
    state_dict_prefix: str | None = None,
):
    """Returns a text_embed_fn: list[str] -> [N, proj_dim] CLIP text
    embeddings (tokenize host-side, run the text tower + projection) —
    the text half of CLIP-score (``duwu/metrics/clip.py:8-33``).

    ``tokenizer``: any callable with the HF tokenizer convention
    (``CLIPBPETokenizer`` for real vocabularies, ``SimpleTokenizer`` for
    smoke tests — the default when None).
    """
    import jax

    from uwudiff_tpu.models.clip import CLIP_PRESETS, CLIPTextModel

    cfg = dict(CLIP_PRESETS[preset]) if isinstance(preset, str) else dict(preset)
    if projection_dim is not None:
        cfg["projection_dim"] = projection_dim
    elif cfg.get("projection_dim") is None:
        cfg["projection_dim"] = cfg.get("hidden_size", 768)
    model = CLIPTextModel.from_config(cfg)

    if tokenizer is None:
        from uwudiff_tpu.models.tokenizers import SimpleTokenizer

        tokenizer = SimpleTokenizer(vocab_size=model.vocab_size)

    state = {}

    def build_params(ids):
        params = model.init(jax.random.PRNGKey(0), ids)["params"]
        if params_path and params_path.endswith(_TORCH_SUFFIXES):
            from uwudiff_tpu.models.import_torch import (
                clip_text_key_map,
                extract_state_dict,
                import_params,
                load_torch_state_dict,
            )

            sd = load_torch_state_dict(params_path)
            sd = extract_state_dict(sd, state_dict_key, state_dict_prefix)
            params = import_params(params, sd, clip_text_key_map, strict=False)
        elif params_path:
            from uwudiff_tpu.training.checkpoint import load_params_npz

            params = load_params_npz(params_path, params)
        return params

    def text_embed_fn(texts):
        ids = jnp.asarray(tokenizer(list(texts))["input_ids"])
        if "params" not in state:
            state["params"] = build_params(ids[:1])
        out = model.apply({"params": state["params"]}, ids)
        return out.text_embeds

    return text_embed_fn
