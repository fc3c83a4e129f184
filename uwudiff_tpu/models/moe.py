"""Mixture-of-Experts MLP — the `expert` leg of the parallelism surface.

The reference has no MoE (its largest config is a dense SDXL UNet); this
extends the DiT family the TPU-native way (SURVEY.md §2.3 lists EP as a
first-class strategy slot): token-choice top-k routing with a fixed
per-expert capacity so every shape is static, experts stored as ONE
stacked parameter ([E, d, inner]) whose leading axis shards over an
``expert`` mesh axis, and dispatch/combine as einsums against one-hot
slot tensors — the GShard/Switch formulation, which XLA turns into
an expert-sharded batched matmul plus a psum over the expert axis
(batch stays sharded over ``data`` and replicated over ``expert``, so
no all-to-all is needed at this layout).

Aux losses (Switch load-balance + router z-loss) are sown into the
``moe_losses`` collection; ``DMTrainer`` applies the model with
``mutable=["moe_losses"]`` and adds their sum to the diffusion loss.
Routing runs in fp32 regardless of the compute dtype.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["MoEMlp"]


def _expert_init(batch_axis=(0,)):
    return nn.initializers.variance_scaling(
        1.0,
        "fan_in",
        "truncated_normal",
        in_axis=-2,
        out_axis=-1,
        batch_axis=batch_axis,
    )


class MoEMlp(nn.Module):
    """Token-choice top-k MoE MLP, drop-in for the dense DiT MLP.

    Capacity semantics (standard Switch/GShard): each expert takes at
    most ``ceil(capacity_factor * S * top_k / E)`` tokens per batch row;
    slots are granted in priority order (every token's 1st choice before
    any 2nd choice, token order within a choice rank). Overflowed
    assignments are dropped — the token's MoE output loses that expert's
    contribution and the block residual passes it through.
    """

    hidden_size: int
    num_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25
    mlp_ratio: float = 4.0
    aux_loss_coeff: float = 1e-2
    router_z_coeff: float = 1e-3
    # routing-group size (GShard "group_size"): capacity and the
    # dispatch/combine one-hots are per group of `group_size` tokens
    # instead of the whole sequence, keeping the dispatch einsum
    # O(S * group_size * k) rather than O(S^2 * k / E). None = one
    # group per sequence (exact for short S; quadratic for long S).
    group_size: int | None = None
    # "top_k" = token-choice (each token picks its top-k experts;
    # needs the load-balance aux loss, may drop tokens at capacity).
    # "expert_choice" = EC routing (Zhou et al. 2022: each expert
    # picks its top-capacity tokens) — perfectly load-balanced by
    # construction, no lb aux loss, no drops from imbalance; tokens
    # may be picked by 0..E experts (residual passes unpicked ones).
    router_type: str = "top_k"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, S, D]
        from uwudiff_tpu.parallel.expert import constrain_expert

        b0, s0, d0 = x.shape
        if self.group_size is not None and self.group_size < s0:
            g = self.group_size
            assert s0 % g == 0, (
                f"seq len {s0} not divisible by group_size {g}"
            )
            x = x.reshape(b0 * (s0 // g), g, d0)
        b, s, d = x.shape
        e, k = self.num_experts, self.top_k
        assert 0 < k <= e, f"top_k={k} must be in (0, num_experts={e}]"
        inner = int(self.hidden_size * self.mlp_ratio)
        cap = int(math.ceil(self.capacity_factor * s * k / e))
        cap = max(1, min(cap, s))  # a token picks distinct experts

        # --- routing (fp32) ------------------------------------------
        logits = nn.Dense(
            e,
            use_bias=False,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="router",
        )(x.astype(jnp.float32))  # [B, S, E]
        probs = jax.nn.softmax(logits, axis=-1)
        z_loss = jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2)

        if self.router_type == "expert_choice":
            # EC: every expert takes its top-`cap` tokens — dispatch is
            # balanced by construction, so no load-balance aux loss
            affinity = probs.transpose(0, 2, 1)  # [B, E, S]
            gate_ec, idx_ec = jax.lax.top_k(affinity, cap)  # [B, E, C]
            onehot_s = jax.nn.one_hot(idx_ec, s, dtype=jnp.float32)
            dispatch = jnp.einsum("becs->bsec", onehot_s)
            combine = jnp.einsum("bec,becs->bsec", gate_ec, onehot_s)
            aux = self.router_z_coeff * z_loss
        elif self.router_type == "top_k":
            gate, idx = jax.lax.top_k(probs, k)  # [B, S, K]
            gate = gate / jnp.maximum(gate.sum(-1, keepdims=True), 1e-9)

            # slot positions within each expert's queue, priority =
            # (choice rank major, token order minor)
            onehot_e = jax.nn.one_hot(idx, e, dtype=jnp.int32)  # [B,S,K,E]
            ranked = onehot_e.transpose(0, 2, 1, 3).reshape(b, k * s, e)
            pos = jnp.cumsum(ranked, axis=1) - ranked  # 0-based position
            pos = (pos * ranked).sum(-1)  # [B, K*S]
            pos = pos.reshape(b, k, s).transpose(0, 2, 1)  # [B, S, K]

            # one_hot of an out-of-capacity position is all-zero, so the
            # drop mask is implicit
            onehot_c = jax.nn.one_hot(pos, cap, dtype=jnp.float32)
            dispatch = jnp.einsum(
                "bske,bskc->bsec", onehot_e.astype(jnp.float32), onehot_c
            )
            combine = jnp.einsum(
                "bsk,bske,bskc->bsec", gate, onehot_e.astype(jnp.float32),
                onehot_c,
            )

            # Switch load-balance: E * sum_e f_e * P_e (== 1 at uniform
            # P); f_e = fraction of routed slots landing on expert e
            f = ranked.astype(jnp.float32).sum(axis=(0, 1)) / (b * s * k)
            p = probs.mean(axis=(0, 1))  # [E]
            lb_loss = e * jnp.sum(f * p)
            aux = self.aux_loss_coeff * lb_loss + self.router_z_coeff * z_loss
        else:
            raise ValueError(f"unknown router_type {self.router_type!r}")

        # --- aux losses (sown; trainer adds them to the loss) ---------
        self.sow(
            "moe_losses",
            "aux",
            aux,
            reduce_fn=lambda a, b: a + b,
            init_fn=lambda: jnp.zeros((), jnp.float32),
        )

        # --- expert compute (stacked params, EP-shardable) -------------
        wi = self.param(
            "wi", _expert_init(), (e, self.hidden_size, inner), jnp.float32
        )
        bi = self.param("bi", nn.initializers.zeros, (e, inner), jnp.float32)
        wo = self.param(
            "wo", _expert_init(), (e, inner, self.hidden_size), jnp.float32
        )
        bo = self.param(
            "bo", nn.initializers.zeros, (e, self.hidden_size), jnp.float32
        )

        expert_in = jnp.einsum(
            "bsec,bsd->ebcd", dispatch.astype(self.dtype), x.astype(self.dtype)
        )
        expert_in = constrain_expert(expert_in)
        h = jnp.einsum("ebcd,edf->ebcf", expert_in, wi.astype(self.dtype))
        h = h + bi.astype(self.dtype)[:, None, None, :]
        h = nn.gelu(h, approximate=True)
        out = jnp.einsum("ebcf,efd->ebcd", h, wo.astype(self.dtype))
        out = out + bo.astype(self.dtype)[:, None, None, :]
        out = constrain_expert(out)
        y = jnp.einsum("bsec,ebcd->bsd", combine.astype(self.dtype), out)
        return y.reshape(b0, s0, d0)
