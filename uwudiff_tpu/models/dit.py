"""DiT — class-conditional diffusion transformer (DiT-XL/2 class).

BASELINE.json lists "DiT-XL/2 class-conditional training with
EDM/flow-matching schedule" as a target config; the reference's DiT-ish
machinery is its RoPE transformer blocks (``duwu/modules/rope_unet.py``).
This is a TPU-first DiT: patchify -> adaLN-Zero transformer stack ->
unpatchify, all MXU-shaped matmuls, fixed 2D sin-cos position embedding
(+ optional learned axial RoPE), class-label CFG dropout.

The model is split into ``embed`` / ``backbone`` / ``head`` methods so
the depth-wise block stack can also be driven externally — the pipeline-
parallel path (``parallel/pipeline.py``) runs ``embed`` and ``head``
replicated and the stack as a GPipe pipeline over a ``pipe`` mesh axis.
``scan_blocks=True`` folds the ``depth`` identical blocks into one
``nn.scan`` (single block body in the HLO; params stacked on a leading
layer axis — the layout pipeline parallelism shards stage-wise).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from uwudiff_tpu.models.layers import get_timestep_embedding
from uwudiff_tpu.models.rope import AxialRoPE, make_axial_pos
from uwudiff_tpu.ops import dot_product_attention

__all__ = ["DiT", "DIT_PRESETS"]


def _2d_sincos_pos_embed(
    dim: int,
    h: int,
    w: int,
    h_coords: np.ndarray | None = None,
    w_coords: np.ndarray | None = None,
) -> np.ndarray:
    """Fixed 2D sin-cos position embedding, [h*w, dim].

    Matches the public MAE/DiT/diffusers ``get_2d_sincos_pos_embed``
    bit-for-bit, including its quirk: ``np.meshgrid(w, h)`` puts the
    w-coordinates in ``grid[0]``, and the reference code feeds
    ``grid[0]`` to the FIRST half of the embedding — so the layout is
    [w-emb | h-emb]. Kept identical so real DiT/SD3 checkpoints (whose
    ``pos_embed`` buffer bakes this layout into the trained weights)
    import faithfully (``import_torch.py::dit_key_map``).
    """
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    # explicit coords support the SD3 cropped-grid convention (MMDiT's
    # pos_embed_max_size: fractional, center-offset positions)
    gh = (
        np.arange(h, dtype=np.float64)
        if h_coords is None
        else np.asarray(h_coords, np.float64)
    )
    gw = (
        np.arange(w, dtype=np.float64)
        if w_coords is None
        else np.asarray(w_coords, np.float64)
    )
    grid = np.meshgrid(gw, gh)  # grid[0] = w-coords, grid[1] = h-coords
    emb_first = _1d(dim // 2, np.asarray(grid[0]).reshape(-1))
    emb_second = _1d(dim // 2, np.asarray(grid[1]).reshape(-1))
    return np.concatenate([emb_first, emb_second], axis=1)


class DiTBlock(nn.Module):
    """adaLN-Zero transformer block.

    ``num_experts > 0`` swaps the dense MLP for a token-choice top-k
    MoE (``models/moe.py``) — the DiT-MoE variant; expert weights
    shard over an ``expert`` mesh axis (``parallel/expert.py``).
    """

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    use_rope: bool = False
    num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_group_size: int | None = None
    moe_router_type: str = "top_k"  # or "expert_choice" (models/moe.py)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c, position_map=None):
        # modulation: 6 * hidden from conditioning, zero-init
        mod = nn.Dense(
            6 * self.hidden_size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="adaLN_modulation",
        )(nn.silu(c))
        shift_a, scale_a, gate_a, shift_m, scale_m, gate_m = jnp.split(
            mod[:, None, :], 6, axis=-1
        )

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype,
                         name="norm1")(x)
        h = h * (1 + scale_a) + shift_a
        b, s, _ = h.shape
        head_dim = self.hidden_size // self.num_heads
        q = nn.Dense(self.hidden_size, dtype=self.dtype, name="q")(h)
        k = nn.Dense(self.hidden_size, dtype=self.dtype, name="k")(h)
        v = nn.Dense(self.hidden_size, dtype=self.dtype, name="v")(h)
        q = q.reshape(b, s, self.num_heads, head_dim)
        k = k.reshape(b, s, self.num_heads, head_dim)
        v = v.reshape(b, s, self.num_heads, head_dim)
        if self.use_rope:
            rope = AxialRoPE(dim=head_dim, n_heads=self.num_heads,
                             dtype=self.dtype, name="rope")
            q = rope(q, position_map)
            k = rope(k, position_map)
        attn = dot_product_attention(q, k, v).reshape(b, s, self.hidden_size)
        attn = nn.Dense(self.hidden_size, dtype=self.dtype, name="proj")(attn)
        x = x + gate_a * attn

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype,
                         name="norm2")(x)
        h = h * (1 + scale_m) + shift_m
        if self.num_experts:
            from uwudiff_tpu.models.moe import MoEMlp

            h = MoEMlp(
                hidden_size=self.hidden_size,
                num_experts=self.num_experts,
                top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                group_size=self.moe_group_size,
                router_type=self.moe_router_type,
                mlp_ratio=self.mlp_ratio,
                dtype=self.dtype,
                name="moe",
            )(h)
        else:
            inner = int(self.hidden_size * self.mlp_ratio)
            h = nn.Dense(inner, dtype=self.dtype, name="mlp_fc1")(h)
            h = nn.gelu(h, approximate=True)
            h = nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + gate_m * h


class _DiTScanCell(DiTBlock):
    """DiTBlock adapted to the (carry, out) convention ``nn.scan``
    expects."""

    def __call__(self, x, *args):
        return super().__call__(x, *args), None


class DiT(nn.Module):
    """Class-conditional diffusion transformer."""

    patch_size: int = 2
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    in_channels: int = 4
    num_classes: int = 1000
    class_dropout_prob: float = 0.1
    learn_sigma: bool = False
    use_rope: bool = False
    # MoE (DiT-MoE): >0 replaces every block's MLP with a top-k
    # mixture of `num_experts` experts (models/moe.py); the aux losses
    # are sown into "moe_losses" and added by DMTrainer
    num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_group_size: int | None = None
    moe_router_type: str = "top_k"
    gradient_checkpointing: bool = False
    scan_blocks: bool = False
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, config: str | dict, **overrides) -> "DiT":
        if isinstance(config, str):
            config = dict(DIT_PRESETS[config])
        else:
            config = dict(config)
        config.update(overrides)
        if "dtype" in config and isinstance(config["dtype"], str):
            config["dtype"] = jnp.dtype(config["dtype"]).type
        return cls(**config)

    @property
    def addition_embed_type(self):
        return None

    def setup(self):
        self.patch_embed = nn.Conv(
            self.hidden_size,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
        )
        self.t_fc1 = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.t_fc2 = nn.Dense(self.hidden_size, dtype=self.dtype)
        # null class at index num_classes (CFG dropout target); params
        # materialize lazily — class-free models never create them
        self.label_embed = nn.Embed(
            self.num_classes + 1, self.hidden_size, dtype=self.dtype
        )

        block_kwargs = dict(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            use_rope=self.use_rope,
            num_experts=self.num_experts,
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_group_size=self.moe_group_size,
            moe_router_type=self.moe_router_type,
            dtype=self.dtype,
        )
        if self.scan_blocks and self.depth > 1:
            cell = _DiTScanCell
            if self.gradient_checkpointing:
                # scan-of-remat: checkpoint each iteration so backward
                # recomputes one block at a time (see
                # models/transformer.py::remat_cell for the memory math)
                cell = nn.remat(cell, prevent_cse=False)
            self.blocks = nn.scan(
                cell,
                variable_axes={"params": 0, "moe_losses": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.depth,
                in_axes=(nn.broadcast, nn.broadcast),
            )(**block_kwargs)
        else:
            block_cls = (
                nn.remat(DiTBlock)
                if self.gradient_checkpointing
                else DiTBlock
            )
            self.blocks = [
                block_cls(**block_kwargs) for _ in range(self.depth)
            ]

        self.final_modulation = nn.Dense(
            2 * self.hidden_size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )
        self.final_norm = nn.LayerNorm(
            use_bias=False, use_scale=False, dtype=self.dtype
        )
        out_channels = self.in_channels * (2 if self.learn_sigma else 1)
        self.final_proj = nn.Dense(
            self.patch_size * self.patch_size * out_channels,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
        )

    # -- stages -------------------------------------------------------

    def embed(
        self,
        sample: jnp.ndarray,  # [B, H, W, C]
        timesteps: jnp.ndarray,  # [B]
        class_labels: jnp.ndarray | None = None,  # [B] int
        train: bool = False,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Patchify + position embedding and the (time+class)
        conditioning vector: ``(tokens [B,S,D], cond [B,D])``."""
        b, h, w, _ = sample.shape
        p = self.patch_size
        gh, gw = h // p, w // p

        x = self.patch_embed(sample.astype(self.dtype))
        x = x.reshape(b, gh * gw, self.hidden_size)
        pos = jnp.asarray(
            _2d_sincos_pos_embed(self.hidden_size, gh, gw), self.dtype
        )
        x = x + pos[None]

        t_emb = get_timestep_embedding(
            jnp.atleast_1d(timesteps), 256
        ).astype(self.dtype)
        t_emb = self.t_fc2(nn.silu(self.t_fc1(t_emb)))
        c_emb = t_emb
        if class_labels is not None:
            labels = class_labels
            if train and self.class_dropout_prob > 0:
                drop = jax.random.bernoulli(
                    self.make_rng("dropout"),
                    self.class_dropout_prob,
                    (b,),
                )
                labels = jnp.where(drop, self.num_classes, labels)
            c_emb = c_emb + self.label_embed(labels)
        return x, c_emb

    def backbone(self, x, c_emb, position_map=None):
        if self.scan_blocks and self.depth > 1:
            x, _ = self.blocks(x, c_emb, position_map)
        else:
            for blk in self.blocks:
                x = blk(x, c_emb, position_map)
        return x

    def head(self, x, c_emb, sample_shape) -> jnp.ndarray:
        """Final adaLN + zero-init projection + unpatchify."""
        b, h, w, _ = sample_shape
        p = self.patch_size
        gh, gw = h // p, w // p
        out_channels = self.in_channels * (2 if self.learn_sigma else 1)

        mod = self.final_modulation(nn.silu(c_emb))
        shift, scale = jnp.split(mod[:, None, :], 2, axis=-1)
        x = self.final_norm(x)
        x = x * (1 + scale) + shift
        x = self.final_proj(x)
        x = x.reshape(b, gh, gw, p, p, out_channels)
        x = jnp.einsum("bhwpqc->bhpwqc", x).reshape(
            b, gh * p, gw * p, out_channels
        )
        return x.astype(jnp.float32)

    # -- pipeline hooks (pure, no bound variables) ---------------------

    def block_position_map(self, sample_shape):
        """RoPE position map for the block stack (None without RoPE)."""
        if not self.use_rope:
            return None
        p = self.patch_size
        return make_axial_pos(sample_shape[1] // p, sample_shape[2] // p)

    def apply_block(self, block_params, x, extras, position_map=None):
        """Apply ONE block functionally from its (unstacked) param
        slice — the pipeline-parallel stage body."""
        (c_emb,) = extras
        block = DiTBlock(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            use_rope=self.use_rope,
            num_experts=self.num_experts,
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_group_size=self.moe_group_size,
            moe_router_type=self.moe_router_type,
            dtype=self.dtype,
            parent=None,  # detached: not a child of this (unbound) module
        )
        return block.apply({"params": block_params}, x, c_emb, position_map)

    def __call__(
        self,
        sample: jnp.ndarray,  # [B, H, W, C]
        timesteps: jnp.ndarray,  # [B]
        class_labels: jnp.ndarray | None = None,  # [B] int
        train: bool = False,
    ) -> jnp.ndarray:
        x, c_emb = self.embed(sample, timesteps, class_labels, train=train)
        x = self.backbone(
            x, c_emb, self.block_position_map(sample.shape)
        )
        return self.head(x, c_emb, sample.shape)


DIT_PRESETS: dict[str, dict] = {
    "dit_xl_2": dict(patch_size=2, hidden_size=1152, depth=28, num_heads=16),
    "dit_l_2": dict(patch_size=2, hidden_size=1024, depth=24, num_heads=16),
    "dit_b_2": dict(patch_size=2, hidden_size=768, depth=12, num_heads=12),
    "dit_s_2": dict(patch_size=2, hidden_size=384, depth=12, num_heads=6),
    "tiny": dict(
        patch_size=2, hidden_size=32, depth=2, num_heads=2, num_classes=10
    ),
    # DiT-MoE (arXiv:2407.11633 scale points): top-2 of E experts per
    # block, dense attention — S/2 and B/2 activated-param classes
    "dit_moe_s_2_8e": dict(
        patch_size=2, hidden_size=384, depth=12, num_heads=6,
        num_experts=8, moe_top_k=2,
    ),
    "dit_moe_b_2_8e": dict(
        patch_size=2, hidden_size=768, depth=12, num_heads=12,
        num_experts=8, moe_top_k=2,
    ),
    "tiny_moe": dict(
        patch_size=2, hidden_size=32, depth=2, num_heads=2,
        num_classes=10, num_experts=4, moe_top_k=2,
    ),
}
# prefixed aliases: bench.py routes BENCH_MODEL by the "dit" prefix
DIT_PRESETS["dit_tiny"] = DIT_PRESETS["tiny"]
DIT_PRESETS["dit_tiny_moe"] = DIT_PRESETS["tiny_moe"]
