"""MoE MLP + expert parallelism (`expert` mesh axis).

Covers: routing/dispatch parity against a per-token Python reference
(including capacity-overflow drops in the documented priority order),
the sown aux losses, MoE-DiT forward/grad, expert-axis param sharding,
and DMTrainer loss parity between an expert-parallel mesh and a
single-device run.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwudiff_tpu.models.dit import DiT
from uwudiff_tpu.models.moe import MoEMlp
from uwudiff_tpu.parallel import fsdp_param_sharding, make_mesh
from uwudiff_tpu.training import DMTrainer
from uwudiff_tpu.diffusion import DiffusionLoss, NoiseSchedule


def _moe_reference(variables, x, num_experts, top_k, capacity_factor):
    """Per-token loop re-implementation of MoEMlp's routing semantics."""
    p = variables["params"]
    router = np.asarray(p["router"]["kernel"], np.float32)  # [D, E]
    wi = np.asarray(p["wi"], np.float32)
    bi = np.asarray(p["bi"], np.float32)
    wo = np.asarray(p["wo"], np.float32)
    bo = np.asarray(p["bo"], np.float32)
    x = np.asarray(x, np.float32)
    b, s, d = x.shape
    e = num_experts
    cap = max(1, min(int(math.ceil(capacity_factor * s * top_k / e)), s))

    logits = x @ router  # [B, S, E]
    z = logits - logits.max(-1, keepdims=True)
    probs = np.exp(z) / np.exp(z).sum(-1, keepdims=True)

    def gelu(a):
        return (
            0.5 * a * (1.0 + np.tanh(0.7978845608028654 * (a + 0.044715 * a**3)))
        )

    y = np.zeros_like(x)
    for bb in range(b):
        # top-k per token (descending prob; ties by lower index, which is
        # what lax.top_k does)
        order = np.argsort(-probs[bb], axis=-1, kind="stable")[:, :top_k]
        gates = np.take_along_axis(probs[bb], order, axis=-1)
        gates = gates / np.maximum(gates.sum(-1, keepdims=True), 1e-9)
        fill = np.zeros(e, np.int64)
        # priority: choice rank major, token order minor
        granted = np.zeros((s, top_k), bool)
        for kk in range(top_k):
            for ss in range(s):
                ee = order[ss, kk]
                if fill[ee] < cap:
                    granted[ss, kk] = True
                    fill[ee] += 1
        for ss in range(s):
            for kk in range(top_k):
                if not granted[ss, kk]:
                    continue
                ee = order[ss, kk]
                h = gelu(x[bb, ss] @ wi[ee] + bi[ee])
                y[bb, ss] += gates[ss, kk] * (h @ wo[ee] + bo[ee])
    return y


@pytest.mark.parametrize("capacity_factor", [8.0, 0.5])
def test_moe_matches_per_token_reference(capacity_factor):
    b, s, d, e, k = 2, 8, 16, 4, 2
    moe = MoEMlp(
        hidden_size=d, num_experts=e, top_k=k,
        capacity_factor=capacity_factor,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, d))
    variables = moe.init(rng, x)
    y = moe.apply(variables, x)
    ref = _moe_reference(variables, x, e, k, capacity_factor)
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-5)


def test_moe_aux_losses_uniform_router():
    """Zero router -> uniform probs -> load-balance loss exactly 1 and
    z-loss exactly (log E)^2."""
    b, s, d, e = 2, 8, 16, 4
    moe = MoEMlp(hidden_size=d, num_experts=e, top_k=2,
                 aux_loss_coeff=0.01, router_z_coeff=0.001)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, d))
    params = moe.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: (
            jnp.zeros_like(v)
            if "router" in "/".join(str(getattr(q, "key", q)) for q in p)
            else v
        ),
        params,
    )
    _, mut = moe.apply({"params": params}, x, mutable=["moe_losses"])
    (aux,) = jax.tree_util.tree_leaves(mut)
    expected = 0.01 * 1.0 + 0.001 * math.log(e) ** 2
    np.testing.assert_allclose(float(aux), expected, rtol=1e-5)


def test_moe_grads_reach_router_and_experts():
    b, s, d, e = 2, 8, 16, 4
    moe = MoEMlp(hidden_size=d, num_experts=e, top_k=2, capacity_factor=8.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, d))
    variables = moe.init(jax.random.PRNGKey(0), x)

    def loss(params):
        y, mut = moe.apply(
            {"params": params}, x, mutable=["moe_losses"]
        )
        (aux,) = jax.tree_util.tree_leaves(mut)
        return jnp.sum(y**2) + aux

    grads = jax.grad(loss)(variables["params"])
    for name in ("router", "wi", "wo"):
        leaf = grads[name]["kernel"] if name == "router" else grads[name]
        assert float(jnp.max(jnp.abs(leaf))) > 0, f"zero grad on {name}"


def _tiny_moe_dit(**over):
    return DiT.from_config("tiny_moe", **over)


@pytest.mark.parametrize("scan_blocks", [False, True])
def test_moe_dit_forward_and_aux(scan_blocks):
    model = _tiny_moe_dit(scan_blocks=scan_blocks)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    t = jnp.asarray([10.0, 500.0])
    labels = jnp.asarray([1, 2])
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x, t, labels, train=True,
    )
    out, mut = model.apply(
        {"params": variables["params"]}, x, t, labels, train=False,
        mutable=["moe_losses"],
    )
    assert out.shape == x.shape
    total = sum(float(jnp.sum(l)) for l in jax.tree_util.tree_leaves(mut))
    assert np.isfinite(total) and total > 0
    if scan_blocks:
        # stacked expert kernels: [layers, E, d, inner]
        wi = variables["params"]["blocks"]["moe"]["wi"]
        assert wi.shape[:2] == (2, 4)


def test_expert_param_sharding():
    model = _tiny_moe_dit(scan_blocks=True)
    x = jnp.zeros((1, 8, 8, 4))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x, jnp.zeros((1,)), jnp.zeros((1,), jnp.int32), train=True,
    )
    mesh = make_mesh({"data": 2, "expert": 4})
    sh = fsdp_param_sharding(variables["params"], mesh)
    moe_sh = sh["blocks"]["moe"]
    assert "expert" in str(moe_sh["wi"].spec)
    assert "expert" in str(moe_sh["wo"].spec)
    # stacked layout: expert rides dim 1 (dim 0 is the layer stack)
    assert moe_sh["wi"].spec[1] == "expert"
    # router stays off the expert axis
    assert "expert" not in str(moe_sh["router"]["kernel"].spec)


def _train_loss(mesh_axes, scan_blocks=False, steps=2):
    trainer = DMTrainer(
        model_config={
            "unet": _tiny_moe_dit(scan_blocks=scan_blocks),
            "te": None,
            "vae": None,
        },
        lr=1e-3,
        use_warm_up=False,
        loss_config=DiffusionLoss(schedule=NoiseSchedule.sdxl()),
        mesh_axes=mesh_axes,
        seed=0,
    )
    rng = np.random.default_rng(0)
    batch = {
        "sample": rng.standard_normal((4, 8, 8, 4)).astype(np.float32),
        "class_labels": np.arange(4, dtype=np.int32) % 10,
        "tokenizer_outputs": [],
    }
    losses = []
    for _ in range(steps):
        m, _ = trainer.train_step(batch)
        losses.append(float(m["train/loss"]))
    return losses


def test_expert_parallel_matches_single_device():
    ep = _train_loss({"data": 2, "expert": 4})
    single = _train_loss({"data": 1})
    np.testing.assert_allclose(ep, single, rtol=2e-4)


def test_expert_parallel_scanned_stack():
    losses = _train_loss({"data": 2, "expert": 4}, scan_blocks=True)
    assert all(np.isfinite(l) for l in losses)
    # the second step must differ (training is actually updating params)
    assert losses[0] != losses[1]


def test_moe_plus_pipe_rejected():
    trainer = DMTrainer(
        model_config={
            "unet": _tiny_moe_dit(scan_blocks=True),
            "te": None,
            "vae": None,
        },
        loss_config=DiffusionLoss(schedule=NoiseSchedule.sdxl()),
        mesh_axes={"data": 2, "pipe": 2},
        seed=0,
    )
    batch = {
        "sample": np.zeros((4, 8, 8, 4), np.float32),
        "class_labels": np.zeros((4,), np.int32),
        "tokenizer_outputs": [],
    }
    with pytest.raises(ValueError, match="MoE"):
        trainer.train_step(batch)


def test_moe_group_size_matches_reshaped_ungrouped():
    """group_size=g routing == ungrouped routing on [B*(S/g), g, D]."""
    b, s, d, e, k, g = 2, 16, 16, 4, 2, 4
    grouped = MoEMlp(hidden_size=d, num_experts=e, top_k=k,
                     capacity_factor=1.0, group_size=g)
    ungrouped = MoEMlp(hidden_size=d, num_experts=e, top_k=k,
                       capacity_factor=1.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, d))
    params = grouped.init(jax.random.PRNGKey(0), x)["params"]
    y_g = grouped.apply({"params": params}, x)
    y_u = ungrouped.apply(
        {"params": params}, x.reshape(b * s // g, g, d)
    ).reshape(b, s, d)
    np.testing.assert_allclose(np.asarray(y_g), np.asarray(y_u), atol=1e-6)


def test_moe_dit_group_size_trains():
    losses = []
    trainer = DMTrainer(
        model_config={
            "unet": _tiny_moe_dit(moe_group_size=8),
            "te": None,
            "vae": None,
        },
        lr=1e-3,
        use_warm_up=False,
        loss_config=DiffusionLoss(schedule=NoiseSchedule.sdxl()),
        mesh_axes={"data": 1},
        seed=0,
    )
    rng = np.random.default_rng(0)
    batch = {
        "sample": rng.standard_normal((2, 8, 8, 4)).astype(np.float32),
        "class_labels": np.arange(2, dtype=np.int32),
        "tokenizer_outputs": [],
    }
    m, _ = trainer.train_step(batch)
    assert np.isfinite(float(m["train/loss"]))


def _mmdit_moe_losses(mesh_axes, steps=2):
    from uwudiff_tpu.diffusion import RectifiedFlowLoss
    from uwudiff_tpu.models.mmdit import MMDiT
    from uwudiff_tpu.models.text_encoders import ConcatTextEncoders
    from uwudiff_tpu.models.tokenizers import SimpleTokenizer

    te = ConcatTextEncoders.from_config(
        [
            (
                {"model_type": "clip", "preset": "tiny"},
                {"use_pooled": True, "layer_idx": -2},
            )
        ]
    )
    trainer = DMTrainer(
        model_config={
            "unet": MMDiT.from_config(
                "tiny_moe", context_dim=32, pooled_dim=32
            ),
            "te": te,
            "vae": None,
        },
        lr=1e-3,
        use_warm_up=False,
        loss_config=RectifiedFlowLoss(schedule=NoiseSchedule.sdxl()),
        mesh_axes=mesh_axes,
        seed=0,
    )
    rng = np.random.default_rng(0)
    batch = {
        "sample": rng.standard_normal((4, 16, 16, 4)).astype(np.float32),
        "captions": ["a", "b", "c", "d"],
        "tokenizer_outputs": [
            SimpleTokenizer()(["a", "b", "c", "d"], padding=True,
                              truncation=True)
        ],
    }
    return [
        float(trainer.train_step(batch)[0]["train/loss"])
        for _ in range(steps)
    ]


def test_mmdit_moe_expert_parallel_matches_single_device():
    """MMDiT with MoE image-stream MLPs: the moe_losses collection flows
    through the dual-stream scan-free path and EP matches 1 device."""
    ep = _mmdit_moe_losses({"data": 2, "expert": 4})
    single = _mmdit_moe_losses({"data": 1})
    assert all(np.isfinite(l) for l in ep)
    np.testing.assert_allclose(ep, single, rtol=2e-4)


def _ec_reference(variables, x, num_experts, capacity_factor, top_k):
    """Per-expert loop oracle for expert-choice routing."""
    p = variables["params"]
    router = np.asarray(p["router"]["kernel"], np.float32)
    wi = np.asarray(p["wi"], np.float32)
    bi = np.asarray(p["bi"], np.float32)
    wo = np.asarray(p["wo"], np.float32)
    bo = np.asarray(p["bo"], np.float32)
    x = np.asarray(x, np.float32)
    b, s, d = x.shape
    e = num_experts
    cap = max(1, min(int(math.ceil(capacity_factor * s * top_k / e)), s))

    logits = x @ router
    z = logits - logits.max(-1, keepdims=True)
    probs = np.exp(z) / np.exp(z).sum(-1, keepdims=True)  # [B, S, E]

    def gelu(a):
        return 0.5 * a * (
            1.0 + np.tanh(0.7978845608028654 * (a + 0.044715 * a**3))
        )

    y = np.zeros_like(x)
    for bb in range(b):
        for ee in range(e):
            # each expert picks its top-cap tokens by affinity
            order = np.argsort(-probs[bb, :, ee], kind="stable")[:cap]
            for ss in order:
                h = gelu(x[bb, ss] @ wi[ee] + bi[ee])
                y[bb, ss] += probs[bb, ss, ee] * (h @ wo[ee] + bo[ee])
    return y


def test_expert_choice_matches_reference():
    b, s, d, e = 2, 8, 16, 4
    moe = MoEMlp(
        hidden_size=d, num_experts=e, top_k=2, capacity_factor=1.0,
        router_type="expert_choice",
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, d))
    variables = moe.init(jax.random.PRNGKey(0), x)
    y = moe.apply(variables, x)
    ref = _ec_reference(variables, x, e, 1.0, 2)
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-5)


def test_expert_choice_perfectly_balanced():
    """Every expert processes exactly `cap` tokens — dispatch sums to
    cap per (batch, expert)."""
    b, s, d, e = 2, 16, 16, 4
    moe = MoEMlp(
        hidden_size=d, num_experts=e, top_k=2, capacity_factor=1.0,
        router_type="expert_choice",
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, d))
    variables = moe.init(jax.random.PRNGKey(0), x)
    # recompute dispatch the way the layer does
    logits = x @ variables["params"]["router"]["kernel"]
    probs = jax.nn.softmax(logits, axis=-1)
    cap = math.ceil(1.0 * s * 2 / e)
    _, idx = jax.lax.top_k(probs.transpose(0, 2, 1), cap)
    onehot = jax.nn.one_hot(idx, s)
    per_expert = np.asarray(onehot.sum(axis=(2, 3)))  # [B, E]
    np.testing.assert_array_equal(per_expert, np.full((b, e), cap))


def test_expert_choice_dit_ep_parity():
    ec_kwargs = dict(moe_router_type="expert_choice")

    # EC model: EP mesh must match single device
    def run(mesh):
        trainer = DMTrainer(
            model_config={
                "unet": _tiny_moe_dit(**ec_kwargs),
                "te": None,
                "vae": None,
            },
            lr=1e-3,
            use_warm_up=False,
            loss_config=DiffusionLoss(schedule=NoiseSchedule.sdxl()),
            mesh_axes=mesh,
            seed=0,
        )
        rng = np.random.default_rng(0)
        batch = {
            "sample": rng.standard_normal((4, 8, 8, 4)).astype(np.float32),
            "class_labels": np.arange(4, dtype=np.int32) % 10,
            "tokenizer_outputs": [],
        }
        return [
            float(trainer.train_step(batch)[0]["train/loss"])
            for _ in range(2)
        ]

    np.testing.assert_allclose(
        run({"data": 2, "expert": 4}), run({"data": 1}), rtol=2e-4
    )


def test_moe_scan_remat_gradients():
    """scan-of-remat + MoE: the sown aux losses survive nn.remat inside
    nn.scan and expert/router grads flow (adaLN gates randomized — they
    are zero-init, which zeroes MLP grads at step 0 by design)."""
    model = _tiny_moe_dit(scan_blocks=True, gradient_checkpointing=True)
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.ones((2,))
    lab = jnp.zeros((2,), jnp.int32)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, t, lab, train=True,
    )
    leaves, treedef = jax.tree_util.tree_flatten(v["params"])
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = treedef.unflatten(
        [l + 0.1 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)]
    )

    def loss(p):
        out, mut = model.apply(
            {"params": p}, x, t, lab, train=False, mutable=["moe_losses"]
        )
        aux = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(mut))
        return jnp.sum(out**2) + aux

    g = jax.grad(loss)(params)
    assert float(jnp.sum(jnp.abs(g["blocks"]["moe"]["wi"]))) > 0
    assert float(jnp.sum(jnp.abs(g["blocks"]["moe"]["router"]["kernel"]))) > 0
