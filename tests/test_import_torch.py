"""The torch-checkpoint importer: a reference `best_model.pt` becomes a
framework run directory whose predictions match the torch model bit-for-bit
(well, float-for-float).

The torch model here is built independently with the reference's exact module
*names* (channel_attention.fc / cnn_encoder / gru / classifier — reference
models.py:34-71), so its `state_dict()` keys are what a real reference
checkpoint contains."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402

from multimodalsignal_tpu.experiments.import_torch import (  # noqa: E402
    TorchImportError,
    import_torch_checkpoint,
    infer_model_config,
    load_torch_state_dict,
)


def make_reference_torch_model(in_channels, num_classes, cnn_out=32,
                               hidden=64, layers=2, reduction=4):
    """Reference topology with reference attribute names (models.py:34-71)."""

    class ChannelAttention(nn.Module):
        def __init__(self, c, r):
            super().__init__()
            self.avg_pool = nn.AdaptiveAvgPool1d(1)
            self.fc = nn.Sequential(
                nn.Linear(c, c // r, bias=False),
                nn.ReLU(inplace=True),
                nn.Linear(c // r, c, bias=False),
                nn.Sigmoid(),
            )

        def forward(self, x):
            b, c, _ = x.size()
            y = self.avg_pool(x).view(b, c)
            return x * self.fc(y).view(b, c, 1)

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.channel_attention = ChannelAttention(in_channels, reduction)
            self.cnn_encoder = nn.Sequential(
                nn.Conv1d(in_channels, 16, 7, stride=2, padding=3, bias=False),
                nn.BatchNorm1d(16),
                nn.ReLU(),
                nn.MaxPool1d(3, stride=2, padding=1),
                nn.Conv1d(16, cnn_out, 5, stride=2, padding=2, bias=False),
                nn.BatchNorm1d(cnn_out),
                nn.ReLU(),
                nn.MaxPool1d(3, stride=2, padding=1),
            )
            self.gru = nn.GRU(cnn_out, hidden, layers, batch_first=True,
                              bidirectional=True)
            self.classifier = nn.Sequential(
                nn.Linear(hidden * 2, 64),
                nn.ReLU(),
                nn.Dropout(0.5),
                nn.Linear(64, num_classes),
            )

        def forward(self, x):
            x = self.channel_attention(x)
            x = self.cnn_encoder(x)
            out, _ = self.gru(x.permute(0, 2, 1))
            return self.classifier(out[:, -1, :])

    return Model()


def _randomize_bn_stats(model, rng):
    """Non-trivial running stats so the import covers batch_stats too."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm1d):
            m.running_mean.copy_(torch.tensor(
                rng.standard_normal(m.running_mean.shape), dtype=torch.float32))
            m.running_var.copy_(torch.tensor(
                0.5 + rng.random(m.running_var.shape), dtype=torch.float32))


CHANNELS6 = ("chest_ECG", "chest_EDA", "chest_EMG", "chest_Resp",
             "wrist_BVP", "wrist_EDA")


def _import_and_check_logits(tmp_path, channels, classes, hidden, layers):
    rng = np.random.default_rng(0)
    tm = make_reference_torch_model(len(channels), classes, cnn_out=16,
                                    hidden=hidden, layers=layers)
    with torch.no_grad():
        _randomize_bn_stats(tm, rng)
    tm.eval()
    pt = tmp_path / "best_model.pt"
    torch.save(tm.state_dict(), pt)

    mode = "ternary" if classes == 3 else "stress_binary"
    out = tmp_path / "imported"
    cfg, state = import_torch_checkpoint(pt, channels, mode, out)

    x = rng.standard_normal((4, len(channels), 512)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()

    from multimodalsignal_tpu.models import build_model

    model = build_model(cfg.model, cfg.num_classes)
    got = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jax.numpy.asarray(x), train=False,
    ))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)

    saved = json.loads((out / "config.json").read_text())
    assert saved["model"]["gru_hidden_size"] == hidden
    assert saved["model"]["gru_num_layers"] == layers
    assert tuple(saved["channels_to_use"]) == tuple(channels)
    return out, classes, channels


def test_imported_checkpoint_matches_torch_logits(tmp_path):
    """Quick tier: degenerate-gate (C=3 < reduction) topology, logit parity
    at a short window (the full-C + Predictor drop-in case lives in the
    slow tier — it jit-compiles at T=7680)."""
    _import_and_check_logits(
        tmp_path, ("chest_ECG", "chest_EDA", "chest_Resp"), 3, 8, 1
    )


@pytest.mark.slow
def test_imported_run_dir_drives_predictor(tmp_path):
    """Full 6-channel topology + the emitted run dir is a drop-in for the
    Predictor surface (compiles predict_windows at the real 60 s window)."""
    rng = np.random.default_rng(1)
    out, classes, channels = _import_and_check_logits(
        tmp_path, CHANNELS6, 2, 16, 2
    )
    from multimodalsignal_tpu.experiments.predict import Predictor

    pred = Predictor.from_files(out / "best_model.msgpack", out / "config.json")
    probs = pred.predict_windows(
        rng.standard_normal((3, len(channels), 128 * 60)).astype(np.float32),
        batch_size=4,
    )
    assert probs.shape == (3, classes)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)


def test_infer_model_config_shapes(tmp_path):
    tm = make_reference_torch_model(6, 2, cnn_out=24, hidden=32, layers=2)
    pt = tmp_path / "m.pt"
    torch.save(tm.state_dict(), pt)
    sd = load_torch_state_dict(pt)
    mc, c, k = infer_model_config(sd)
    assert (c, k) == (6, 2)
    assert mc.name == "cnn_gru_attention"
    assert mc.cnn_out_channels == 24
    assert mc.gru_hidden_size == 32
    assert mc.gru_num_layers == 2
    assert mc.reduction_ratio == 6 // (6 // 4)  # rebuilt from fc.0 rows


def test_import_rejects_wrong_channel_count(tmp_path):
    tm = make_reference_torch_model(6, 2, cnn_out=16, hidden=8, layers=1)
    pt = tmp_path / "m.pt"
    torch.save(tm.state_dict(), pt)
    with pytest.raises(TorchImportError, match="6 input channels"):
        import_torch_checkpoint(pt, ("chest_ECG",), "stress_binary",
                                tmp_path / "out")


def test_import_rejects_foreign_state_dict(tmp_path):
    alien = nn.Linear(4, 2)
    pt = tmp_path / "alien.pt"
    torch.save(alien.state_dict(), pt)
    with pytest.raises(TorchImportError, match="missing"):
        import_torch_checkpoint(pt, ("chest_ECG",), "stress_binary",
                                tmp_path / "out")
