"""Model parity vs torch oracles (torch is CPU-only here, used purely as a
numerical reference for the architecture spec in reference models.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from multimodalsignal_tpu.models import (
    BiGRU,
    ChannelAttention,
    CnnGruAttentionModel,
    CnnGruModel,
    gru_sequence,
)

B, C, T = 4, 3, 7680


# ---------------------------------------------------------------------------
# GRU parity vs torch.nn.GRU
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("num_layers,bidirectional_check", [(1, True), (2, True)])
def test_bigru_matches_torch(num_layers, bidirectional_check, rng):
    hidden, feat, t_len, b = 8, 5, 12, 3
    x = rng.standard_normal((b, t_len, feat)).astype(np.float32)

    tgru = tnn.GRU(feat, hidden, num_layers=num_layers, batch_first=True,
                   bidirectional=True, dropout=0.0)
    tgru.eval()
    with torch.no_grad():
        t_out, _ = tgru(torch.from_numpy(x))

    model = BiGRU(hidden_size=hidden, num_layers=num_layers, dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = dict(variables["params"])
    sd = tgru.state_dict()
    for layer in range(num_layers):
        for direction, sfx in (("fwd", ""), ("bwd", "_reverse")):
            pfx = f"l{layer}_{direction}"
            params[f"{pfx}_w_ih"] = jnp.asarray(sd[f"weight_ih_l{layer}{sfx}"].numpy())
            params[f"{pfx}_w_hh"] = jnp.asarray(sd[f"weight_hh_l{layer}{sfx}"].numpy())
            params[f"{pfx}_b_ih"] = jnp.asarray(sd[f"bias_ih_l{layer}{sfx}"].numpy())
            params[f"{pfx}_b_hh"] = jnp.asarray(sd[f"bias_hh_l{layer}{sfx}"].numpy())
    j_out = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), rtol=2e-5, atol=2e-5)


def test_gru_sequence_reverse_alignment(rng):
    """Backward-direction outputs must stay aligned to original time order."""
    h, f, t_len, b = 4, 4, 6, 2
    x = rng.standard_normal((b, t_len, f)).astype(np.float32)
    w_ih = rng.standard_normal((3 * h, f)).astype(np.float32) * 0.1
    w_hh = rng.standard_normal((3 * h, h)).astype(np.float32) * 0.1
    b_ih = np.zeros(3 * h, np.float32)
    b_hh = np.zeros(3 * h, np.float32)
    xg = jnp.asarray(x) @ w_ih.T + b_ih
    h0 = jnp.zeros((b, h), jnp.float32)
    fwd = gru_sequence(xg, jnp.asarray(w_hh), jnp.asarray(b_hh), h0, reverse=False)
    bwd = gru_sequence(xg, jnp.asarray(w_hh), jnp.asarray(b_hh), h0, reverse=True)
    # Reversing the input sequence and flipping the forward output equals bwd.
    xg_flip = xg[:, ::-1]
    fwd_on_flip = gru_sequence(xg_flip, jnp.asarray(w_hh), jnp.asarray(b_hh), h0)
    np.testing.assert_allclose(np.asarray(bwd), np.asarray(fwd_on_flip)[:, ::-1], rtol=1e-5, atol=1e-6)
    assert not np.allclose(np.asarray(fwd), np.asarray(bwd))


# ---------------------------------------------------------------------------
# Full-model parity vs a torch replica of reference models.py
# ---------------------------------------------------------------------------

class TorchChannelAttention(tnn.Module):
    def __init__(self, c, r=4):
        super().__init__()
        self.fc = tnn.Sequential(
            tnn.Linear(c, c // r, bias=False), tnn.ReLU(inplace=True),
            tnn.Linear(c // r, c, bias=False), tnn.Sigmoid(),
        )

    def forward(self, x):
        y = x.mean(dim=2)
        return x * self.fc(y).unsqueeze(-1)


class TorchCnnGruAttention(tnn.Module):
    """Oracle following the published architecture (models.py:34-81)."""

    def __init__(self, in_ch, num_classes, cnn_out=32, hidden=64, layers=2, dropout=0.5):
        super().__init__()
        self.att = TorchChannelAttention(in_ch)
        self.cnn = tnn.Sequential(
            tnn.Conv1d(in_ch, 16, 7, stride=2, padding=3, bias=False),
            tnn.BatchNorm1d(16), tnn.ReLU(), tnn.MaxPool1d(3, 2, 1),
            tnn.Conv1d(16, cnn_out, 5, stride=2, padding=2, bias=False),
            tnn.BatchNorm1d(cnn_out), tnn.ReLU(), tnn.MaxPool1d(3, 2, 1),
        )
        self.gru = tnn.GRU(cnn_out, hidden, num_layers=layers, batch_first=True,
                           bidirectional=True, dropout=dropout if layers > 1 else 0)
        self.head = tnn.Sequential(
            tnn.Linear(hidden * 2, 64), tnn.ReLU(), tnn.Dropout(dropout),
            tnn.Linear(64, num_classes),
        )

    def forward(self, x):
        x = self.att(x)
        x = self.cnn(x)
        x = x.permute(0, 2, 1)
        out, _ = self.gru(x)
        return self.head(out[:, -1, :])


def _copy_torch_to_flax(tm: TorchCnnGruAttention, variables):
    params = jax.tree_util.tree_map(lambda a: a, variables["params"])
    stats = jax.tree_util.tree_map(lambda a: a, variables["batch_stats"])
    params = {k: dict(v) if isinstance(v, dict) else v for k, v in params.items()}

    def npy(t):
        return jnp.asarray(t.detach().numpy())

    if "channel_attention" in params:  # absent when C // r == 0 (constant gate)
        params["channel_attention"]["fc1"]["kernel"] = npy(tm.att.fc[0].weight.T)
        params["channel_attention"]["fc2"]["kernel"] = npy(tm.att.fc[2].weight.T)
    for jname, tidx in (("conv1", 0), ("conv2", 4)):
        w = tm.cnn[tidx].weight  # [out, in, k]
        params["cnn_encoder"][jname]["kernel"] = npy(w.permute(2, 1, 0))
    for jname, tidx in (("bn1", 1), ("bn2", 5)):
        bn = tm.cnn[tidx]
        params["cnn_encoder"][jname]["scale"] = npy(bn.weight)
        params["cnn_encoder"][jname]["bias"] = npy(bn.bias)
        stats["cnn_encoder"][jname]["mean"] = npy(bn.running_mean)
        stats["cnn_encoder"][jname]["var"] = npy(bn.running_var)
    sd = tm.gru.state_dict()
    gru_params = dict(params["gru"])
    for layer in range(tm.gru.num_layers):
        for direction, sfx in (("fwd", ""), ("bwd", "_reverse")):
            pfx = f"l{layer}_{direction}"
            gru_params[f"{pfx}_w_ih"] = npy(sd[f"weight_ih_l{layer}{sfx}"])
            gru_params[f"{pfx}_w_hh"] = npy(sd[f"weight_hh_l{layer}{sfx}"])
            gru_params[f"{pfx}_b_ih"] = npy(sd[f"bias_ih_l{layer}{sfx}"])
            gru_params[f"{pfx}_b_hh"] = npy(sd[f"bias_hh_l{layer}{sfx}"])
    params["gru"] = gru_params
    params["head1"]["kernel"] = npy(tm.head[0].weight.T)
    params["head1"]["bias"] = npy(tm.head[0].bias)
    params["head2"]["kernel"] = npy(tm.head[3].weight.T)
    params["head2"]["bias"] = npy(tm.head[3].bias)
    return {"params": params, "batch_stats": stats}


@pytest.mark.parametrize("in_channels", [3, 8])
def test_full_model_matches_torch_eval(in_channels, rng):
    """C=3 exercises the degenerate constant-0.5 gate (reference quirk:
    Linear(3->0) bottleneck); C=8 exercises the active channel gate."""
    torch.manual_seed(0)
    tm = TorchCnnGruAttention(in_channels, 2)
    tm.eval()
    x = rng.standard_normal((B, in_channels, 512)).astype(np.float32)
    with torch.no_grad():
        t_logits = tm(torch.from_numpy(x)).numpy()

    jm = CnnGruAttentionModel(num_classes=2)
    variables = jm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = _copy_torch_to_flax(tm, variables)
    j_logits = jax.jit(lambda v, xb: jm.apply(v, xb, train=False))(
        variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_logits), t_logits, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Shape / behaviour checks
# ---------------------------------------------------------------------------

def test_forward_shapes_and_param_count():
    x = jnp.zeros((2, 3, T))
    model = CnnGruAttentionModel(num_classes=2)
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = jax.jit(model.apply)(variables, x)
    assert logits.shape == (2, 2)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 0.9e5 < n_params < 1.4e5  # ~1.1e5 at defaults (SURVEY.md §6)


def test_cnn_downsamples_16x():
    from multimodalsignal_tpu.models import ConvEncoder

    enc = ConvEncoder(32)
    x = jnp.zeros((1, T, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(variables, x)
    assert y.shape == (1, 480, 32)


def test_channel_attention_gates_bounded(rng):
    x = jnp.asarray(rng.standard_normal((2, 100, 4)).astype(np.float32))
    mod = ChannelAttention(4)
    variables = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(variables, x)
    ratio = np.asarray(y / (x + 1e-9))
    assert y.shape == x.shape


def test_cnn_gru_model_has_no_attention_params():
    model = CnnGruModel(num_classes=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 512)))
    assert "channel_attention" not in variables["params"]


def test_train_mode_updates_batch_stats_and_dropout(rng):
    x = jnp.asarray(rng.standard_normal((4, 3, 512)).astype(np.float32))
    model = CnnGruAttentionModel(num_classes=2)
    variables = model.init(jax.random.PRNGKey(0), x)
    train_apply = jax.jit(lambda v, xb, key: model.apply(
        v, xb, train=True, rngs={"dropout": key}, mutable=["batch_stats"]))
    logits, mutated = train_apply(variables, x, jax.random.PRNGKey(1))
    before = variables["batch_stats"]["cnn_encoder"]["bn1"]["mean"]
    after = mutated["batch_stats"]["cnn_encoder"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    logits2, _ = train_apply(variables, x, jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


def test_grads_flow(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 512)).astype(np.float32))
    y = jnp.array([0, 1])
    model = CnnGruAttentionModel(num_classes=2)
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(params):
        logits = model.apply({"params": params, "batch_stats": variables["batch_stats"]}, x)
        onehot = jax.nn.one_hot(y, 2)
        return -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits), axis=-1))

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    norms = [float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert max(norms) > 0


def test_bfloat16_compute_path(rng):
    """dtype='bfloat16' computes in bf16 (params stay f32) and returns f32
    logits close to the f32 path."""
    import jax
    import jax.numpy as jnp
    from multimodalsignal_tpu.models import CnnGruAttentionModel

    x = jnp.asarray(rng.standard_normal((4, 3, 512)), jnp.float32)
    m32 = CnnGruAttentionModel(num_classes=2, gru_hidden_size=8, gru_num_layers=1)
    m16 = CnnGruAttentionModel(num_classes=2, gru_hidden_size=8, gru_num_layers=1,
                               dtype=jnp.bfloat16)
    variables = m32.init(jax.random.PRNGKey(0), x, train=False)
    # Params must be float32 regardless of compute dtype.
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(p.dtype == jnp.float32 for p in leaves)
    out32 = jax.jit(lambda v, xb: m32.apply(v, xb, train=False))(variables, x)
    out16 = jax.jit(lambda v, xb: m16.apply(v, xb, train=False))(variables, x)
    assert out16.dtype == jnp.float32
    import numpy as np
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=0.1, atol=0.1)


def test_build_model_fold_parallel_resolves_auto():
    """Callers that vmap the model over folds (sweep, ensemble) resolve
    gru_impl='auto' to the per-direction kernels at build time — direction
    batching measured ~2x slower per sweep epoch at 15 folds
    (benchmarks/RESULTS.md round 3). On the CPU backend both contexts
    resolve to scan inside BiGRU, so pin the build_model-level override:
    fold_parallel pins a concrete impl, plain auto stays deferred."""
    from multimodalsignal_tpu.config import ModelConfig
    from multimodalsignal_tpu.models import build_model

    plain = build_model(ModelConfig(), 2)
    swept = build_model(ModelConfig(), 2, fold_parallel=True)
    assert plain.gru_impl == "auto"
    assert swept.gru_impl in ("pallas", "scan")  # never pallas_db
    import jax

    expected = "pallas" if jax.default_backend() == "tpu" else "scan"
    assert swept.gru_impl == expected


# ---------------------------------------------------------------------------
# Last-timestep pruning (BiGRU.last_only / gru_last_prune)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("num_layers", [1, 2])
def test_bigru_last_only_matches_full_walk(num_layers, rng):
    """last_only prunes the final layer's backward walk to ONE cell step —
    exact math: the backward output at the last original position is the
    first step of the reversed recurrence, and a last-timestep readout
    (reference models.py:79) consumes nothing else from that walk. Tolerance
    is ULP-tight, not bitwise — the standalone cell step compiles with
    different fusion/FMA scheduling than the scan body."""
    hidden, feat, t_len, b = 8, 5, 12, 3
    x = jnp.asarray(rng.standard_normal((b, t_len, feat)).astype(np.float32))
    full = BiGRU(hidden_size=hidden, num_layers=num_layers, impl="scan")
    pruned = BiGRU(hidden_size=hidden, num_layers=num_layers, impl="scan",
                   last_only=True)
    variables = full.init(jax.random.PRNGKey(0), x)
    # Identical parameter tree: pruning changes the op schedule, not params.
    v2 = pruned.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_all(
        jax.tree.map(lambda a, b_: bool((a == b_).all()),
                     variables["params"], v2["params"]))
    y_full = full.apply(variables, x)[:, -1, :]
    y_last = pruned.apply(variables, x)
    assert y_last.shape == (b, 2 * hidden)
    np.testing.assert_allclose(np.asarray(y_last), np.asarray(y_full),
                               rtol=1e-6, atol=1e-7)


def test_model_gru_last_prune_matches_unpruned(rng):
    """The flagship model with gru_last_prune (default) matches the unpruned
    schedule to ULP-level tolerance — forward AND gradients (the pruned
    walk's outputs carry zero cotangent, so its adjoint contributes exactly
    nothing; residual deltas are compiler scheduling only)."""
    x = jnp.asarray(rng.standard_normal((2, 3, 512)).astype(np.float32))
    m1 = CnnGruAttentionModel(num_classes=3, gru_impl="scan")
    m0 = CnnGruAttentionModel(num_classes=3, gru_impl="scan",
                              gru_last_prune=False)
    assert m1.gru_last_prune  # pruning is the default
    variables = m1.init(jax.random.PRNGKey(0), x, train=False)

    y1 = m1.apply(variables, x, train=False)
    y0 = m0.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-6, atol=1e-6)

    def loss(m, p):
        out = m.apply({"params": p, "batch_stats": variables["batch_stats"]},
                      x, train=False)
        return (out ** 2).sum()

    g1 = jax.grad(lambda p: loss(m1, p))(variables["params"])
    g0 = jax.grad(lambda p: loss(m0, p))(variables["params"])
    rel = jax.tree.map(
        lambda a, b_: float(jnp.abs(a - b_).max()
                            / (jnp.abs(a).max() + 1e-12)), g1, g0)
    assert max(jax.tree.leaves(rel)) < 1e-5
