"""Golden forward parity vs the reference architecture in PyTorch.

Builds the reference's exact CnnGruAttention topology (reference
models.py:34-81: attention gate, conv p3/s2 + pool k3/s2/p1 stack, 2-layer
bidirectional GRU, 2-layer head) in torch, transplants the SAME weights into
the flax model, and asserts the logits agree — pinning layer semantics
(padding rules, BN eval statistics, torch GRU gate order r/z/n, last-timestep
readout) rather than just shapes."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodalsignal_tpu.models import CnnGruAttentionModel  # noqa: E402

C, CLASSES, CNN_OUT, HIDDEN, LAYERS = 8, 3, 32, 16, 2


class TorchReferenceModel(nn.Module):
    """Reference topology (models.py:34-81), built independently here."""

    def __init__(self):
        super().__init__()
        self.att_fc1 = nn.Linear(C, C // 4, bias=False)
        self.att_fc2 = nn.Linear(C // 4, C, bias=False)
        self.conv1 = nn.Conv1d(C, 16, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm1d(16)
        self.conv2 = nn.Conv1d(16, CNN_OUT, 5, stride=2, padding=2, bias=False)
        self.bn2 = nn.BatchNorm1d(CNN_OUT)
        self.pool = nn.MaxPool1d(3, stride=2, padding=1)
        self.gru = nn.GRU(CNN_OUT, HIDDEN, LAYERS, batch_first=True,
                          bidirectional=True)
        self.head1 = nn.Linear(2 * HIDDEN, 64)
        self.head2 = nn.Linear(64, CLASSES)

    def forward(self, x):
        g = torch.sigmoid(self.att_fc2(torch.relu(self.att_fc1(x.mean(dim=2)))))
        x = x * g.unsqueeze(-1)
        x = self.pool(torch.relu(self.bn1(self.conv1(x))))
        x = self.pool(torch.relu(self.bn2(self.conv2(x))))
        out, _ = self.gru(x.permute(0, 2, 1))
        h = out[:, -1, :]
        return self.head2(torch.relu(self.head1(h)))


def _t2n(t):
    return np.asarray(t.detach().numpy())


def transplant_weights(tm: TorchReferenceModel, variables):
    """Copy torch weights into the flax param/batch_stats pytree."""
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    bs = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    p["channel_attention"]["fc1"]["kernel"] = _t2n(tm.att_fc1.weight).T
    p["channel_attention"]["fc2"]["kernel"] = _t2n(tm.att_fc2.weight).T
    enc = p["cnn_encoder"]
    enc["conv1"]["kernel"] = _t2n(tm.conv1.weight).transpose(2, 1, 0)
    enc["conv2"]["kernel"] = _t2n(tm.conv2.weight).transpose(2, 1, 0)
    for name, bn in (("bn1", tm.bn1), ("bn2", tm.bn2)):
        enc[name]["scale"] = _t2n(bn.weight)
        enc[name]["bias"] = _t2n(bn.bias)
        bs["cnn_encoder"][name]["mean"] = _t2n(bn.running_mean)
        bs["cnn_encoder"][name]["var"] = _t2n(bn.running_var)
    for layer in range(LAYERS):
        for dirname, sfx in (("fwd", ""), ("bwd", "_reverse")):
            pfx = f"l{layer}_{dirname}"
            p["gru"][f"{pfx}_w_ih"] = _t2n(getattr(tm.gru, f"weight_ih_l{layer}{sfx}"))
            p["gru"][f"{pfx}_w_hh"] = _t2n(getattr(tm.gru, f"weight_hh_l{layer}{sfx}"))
            p["gru"][f"{pfx}_b_ih"] = _t2n(getattr(tm.gru, f"bias_ih_l{layer}{sfx}"))
            p["gru"][f"{pfx}_b_hh"] = _t2n(getattr(tm.gru, f"bias_hh_l{layer}{sfx}"))
    p["head1"]["kernel"] = _t2n(tm.head1.weight).T
    p["head1"]["bias"] = _t2n(tm.head1.bias)
    p["head2"]["kernel"] = _t2n(tm.head2.weight).T
    p["head2"]["bias"] = _t2n(tm.head2.bias)
    return {"params": p, "batch_stats": bs}


@pytest.mark.parametrize("gru_impl", ["scan", "pallas"])
def test_forward_parity_with_torch_reference(rng, gru_impl):
    torch.manual_seed(0)
    tm = TorchReferenceModel().eval()
    # Non-trivial BN running stats (fresh init would hide scale/var mapping).
    with torch.no_grad():
        tm.bn1.running_mean.uniform_(-0.5, 0.5)
        tm.bn1.running_var.uniform_(0.5, 2.0)
        tm.bn2.running_mean.uniform_(-0.5, 0.5)
        tm.bn2.running_var.uniform_(0.5, 2.0)

    x = rng.standard_normal((5, C, 1024)).astype(np.float32)
    with torch.no_grad():
        want = _t2n(tm(torch.from_numpy(x)))

    fm = CnnGruAttentionModel(num_classes=CLASSES, cnn_out_channels=CNN_OUT,
                              gru_hidden_size=HIDDEN, gru_num_layers=LAYERS,
                              gru_impl=gru_impl)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = transplant_weights(tm, variables)
    got = np.asarray(jax.jit(lambda v, xb: fm.apply(v, xb, train=False))(
        variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_adam_weight_decay_parity_with_torch():
    """Our optax chain must reproduce torch.optim.Adam(weight_decay=...)
    exactly (L2 added to the gradient BEFORE the moments, unlike AdamW —
    reference trainer.py:68 semantics) over several steps."""
    from multimodalsignal_tpu.train.optim import make_optimizer
    import optax

    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((6, 4)).astype(np.float32)
    grads = [rng.standard_normal((6, 4)).astype(np.float32) for _ in range(5)]
    lr, wd = 1e-3, 1e-4

    # torch
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([wt], lr=lr, weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    # ours
    tx = make_optimizer(lr, wd)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(),
                               rtol=1e-6, atol=1e-7)


def test_plateau_scheduler_parity_with_torch():
    """plateau_update must match torch ReduceLROnPlateau(mode='min',
    factor=0.1, patience=3, rel threshold) step-for-step on a noisy loss
    sequence (reference trainer.py:72-77)."""
    from multimodalsignal_tpu.train.optim import plateau_init, plateau_update

    lr0, factor, patience = 1e-3, 0.1, 3
    w = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([w], lr=lr0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=factor, patience=patience)

    losses = [1.0, 0.9, 0.95, 0.94, 0.93, 0.93, 0.93, 0.92999, 0.5, 0.51,
              0.52, 0.53, 0.54, 0.55, 0.4]
    state = plateau_init(lr0)
    torch_lrs, ours_lrs = [], []
    for loss in losses:
        sched.step(loss)
        torch_lrs.append(opt.param_groups[0]["lr"])
        state = plateau_update(state, loss, factor=factor, patience=patience)
        ours_lrs.append(float(state.lr))
    np.testing.assert_allclose(ours_lrs, torch_lrs, rtol=1e-6)
