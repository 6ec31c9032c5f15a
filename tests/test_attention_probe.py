"""Channel-attention mechanism probe (analysis/attention_probe.py): the
corruption model, the params-level gate computation, and the per-fold sweep
loop — all quick, against tiny synthetic arrays and a stub predictor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalsignal_tpu.analysis.attention_probe import (
    corrupt_windows,
    gate_activations,
    probe_fold,
)
from multimodalsignal_tpu.models import CnnGruAttentionModel


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_corrupt_windows_deterministic_and_bounded(rng):
    x = rng.standard_normal((40, 6, 32)).astype(np.float32)
    xa, hit_a, chan_a = corrupt_windows(x, 0.5, "rail", seed=7)
    xb, hit_b, chan_b = corrupt_windows(x, 0.5, "rail", seed=7)
    np.testing.assert_array_equal(xa, xb)
    np.testing.assert_array_equal(hit_a, hit_b)
    np.testing.assert_array_equal(chan_a, chan_b)
    # Input untouched; clean windows untouched.
    assert not np.shares_memory(xa, x)
    np.testing.assert_array_equal(xa[~hit_a], x[~hit_a])
    # Rate is approximate but seeded; channel ids valid only where hit.
    assert 0.3 < hit_a.mean() < 0.7
    assert (chan_a[hit_a] >= 0).all() and (chan_a[hit_a] < 6).all()
    assert (chan_a[~hit_a] == -1).all()
    # Rail signature: corrupted channel mean lands in z-units [4-eps, 7+eps];
    # other channels of the same window untouched.
    for i in np.nonzero(hit_a)[0][:5]:
        ch = chan_a[i]
        assert 3.0 < xa[i, ch].mean() < 8.0
        others = [c for c in range(6) if c != ch]
        np.testing.assert_array_equal(xa[i, others], x[i, others])


def test_corrupt_windows_flatline_and_rate_extremes(rng):
    x = rng.standard_normal((30, 3, 16)).astype(np.float32)
    xc, hit, chan = corrupt_windows(x, 1.0, "flatline", seed=1)
    assert hit.all()
    for i in range(5):
        seg = xc[i, chan[i]]
        assert seg.std() < 1e-6 and -4.5 < seg.mean() < -1.5
    _, hit0, _ = corrupt_windows(x, 0.0, "rail", seed=1)
    assert not hit0.any()
    with pytest.raises(ValueError, match="unknown corruption"):
        corrupt_windows(x, 1.0, "bogus", seed=0)


def test_gate_activations_match_module(rng):
    """The params-level gate must equal ChannelAttention's inside the real
    model: gate = sigmoid(fc2(relu(fc1(mean_t(x))))), models/cnn_gru.py:32-49.
    Recovered via x_gated / x = gate."""
    model = CnnGruAttentionModel(num_classes=2, cnn_out_channels=8,
                                 gru_hidden_size=8, gru_num_layers=1,
                                 reduction_ratio=2)
    # Bounded away from zero so gate recovery by division is stable.
    x = rng.uniform(0.5, 1.5, (4, 6, 64)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = variables["params"]

    got = gate_activations(params, x)

    from multimodalsignal_tpu.models.cnn_gru import ChannelAttention
    att = ChannelAttention(reduction_ratio=2)
    xt = jnp.swapaxes(jnp.asarray(x), 1, 2)  # [B, T, C] as the model feeds it
    gated = att.apply({"params": params["channel_attention"]}, xt)
    want = np.asarray(gated / xt)[:, 0, :]  # gate is time-constant
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gate_activations_degenerate_is_half(rng):
    """No attention params (cnn_gru) or C < reduction_ratio (the reference's
    Linear(C->0) quirk) -> constant 0.5 gate."""
    x = rng.standard_normal((3, 2, 8)).astype(np.float32)
    assert (gate_activations({}, x) == 0.5).all()
    model = CnnGruAttentionModel(num_classes=2, cnn_out_channels=8,
                                 gru_hidden_size=4, gru_num_layers=1,
                                 reduction_ratio=4)  # C=2 < 4 -> no fc params
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert (gate_activations(variables["params"], x) == 0.5).all()


class _StubPredictor:
    """Minimal predictor: classifies by the sign of channel 0's mean, and
    carries attention params so gate stats flow."""

    def __init__(self, params):
        class _State:
            pass

        self.state = _State()
        self.state.params = params
        self.state.batch_stats = {}

    def _predict(self, params, batch_stats, x):
        score = jnp.asarray(x)[:, 0, :].mean(axis=-1)
        return jnp.stack([jax.nn.sigmoid(-score), jax.nn.sigmoid(score)], -1)


def test_probe_fold_detects_corruption_effect(rng):
    """A channel-0-dependent classifier must lose accuracy when channel 0
    rails; probe_fold's accuracy curve and gate stats must reflect it."""
    n, c, t = 64, 2, 16
    y = rng.integers(0, 2, n).astype(np.int64)
    x = rng.standard_normal((n, c, t)).astype(np.float32) * 0.1
    x[:, 0, :] += (2.0 * y[:, None] - 1.0)  # channel 0 carries the label

    res = probe_fold(_StubPredictor({}), x, y,
                     rates=[0.0, 1.0], kinds=["rail"], seed=3, num_classes=2)
    clean = res["rail"]["0"]
    hit = res["rail"]["1"]
    assert clean["accuracy"] == 1.0
    # Railing a random channel (half the windows hit channel 0, forcing
    # "positive") must cost accuracy.
    assert hit["accuracy"] < clean["accuracy"]
    assert np.isnan(clean["gate_corrupted"])
    assert hit["gate_corrupted"] == 0.5  # stub has no attention params


@pytest.mark.slow
def test_trained_gate_downweights_railed_channel():
    """Mechanism regression for the benchmark's attention result
    (benchmarks/BENCHMARK.md): trained on windows where a random channel
    sometimes rails (mean-shifted, information-destroying — the corpus's
    artifact signature), the SE channel gate must learn to give railed
    channels a LOWER gate than clean channels on held-out corrupted
    windows. This is the input-conditioned down-weighting that makes
    cnn_gru_attention degrade slower than cnn_gru under the corruption
    probe (analysis/attention_probe.py)."""
    from multimodalsignal_tpu.config import EarlyStoppingConfig, TrainerConfig
    from multimodalsignal_tpu.train.trainer import Trainer

    rng = np.random.default_rng(7)
    n, c, t = 384, 4, 64

    def make(n):
        y = rng.integers(0, 2, n).astype(np.int64)
        x = rng.standard_normal((n, c, t)).astype(np.float32) * 0.5
        x += (2.0 * y[:, None, None] - 1.0)  # every channel carries the label
        hit = rng.random(n) < 0.5
        chan = rng.integers(0, c, n)
        for i in np.nonzero(hit)[0]:
            x[i, chan[i]] = rng.uniform(4.0, 7.0) + \
                0.2 * rng.standard_normal(t).astype(np.float32)
        return x, y, hit, chan

    x_tr, y_tr, _, _ = make(n)
    x_va, y_va, _, _ = make(96)
    model = CnnGruAttentionModel(num_classes=2, cnn_out_channels=8,
                                 gru_hidden_size=8, gru_num_layers=1,
                                 reduction_ratio=1, gru_impl="scan")
    cfg = TrainerConfig(epochs=12, batch_size=32,
                        early_stopping=EarlyStoppingConfig(patience=12))
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        trainer = Trainer(model, d, cfg, num_classes=2, seed=0)
        trainer.train((x_tr, y_tr), (x_va, y_va))
        params = trainer.state.params

    x_te, _, hit, chan = make(256)
    gates = gate_activations(params, x_te)
    g_hit = gates[hit, chan[hit]].mean()
    mask = np.ones_like(gates, bool)
    mask[np.nonzero(hit)[0], chan[hit]] = False
    g_other = gates[np.nonzero(hit)[0]][mask[np.nonzero(hit)[0]]].mean()
    assert g_hit < g_other - 0.02, (
        f"gate did not learn to down-weight railed channels: "
        f"corrupted {g_hit:.3f} vs others {g_other:.3f}"
    )
