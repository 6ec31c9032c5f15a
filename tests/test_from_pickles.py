"""from-pickles staging (dataset.pack_corpus_from_pickles + main --from-pickles):
the fused preprocess+pack must be bit-identical to the two-step
preprocess-CLI -> pack_corpus pipeline it shortcuts."""

import json

import numpy as np
import pytest

from multimodalsignal_tpu.config import (
    ALL_CHANNEL_NAMES,
    ExperimentConfig,
    ModelConfig,
    validate_experiment,
)
from multimodalsignal_tpu.data.dataset import (
    pack_corpus,
    pack_corpus_from_pickles,
)

from tests.conftest import SUBJECTS_SMALL
from tests.test_preprocess import preprocessed  # noqa: F401  (fixture reuse)

CHANNELS = ["chest_ECG", "chest_EDA", "chest_Resp"]


def test_matches_two_step_pipeline(wesad_root, preprocessed):  # noqa: F811
    """pkl -> (in-memory preprocess + pack) == pkl -> npy -> pack, bit for
    bit: both run the same windowing and the same _pack_arrays."""
    two_step = pack_corpus(
        preprocessed / "chest_raw", SUBJECTS_SMALL, CHANNELS,
        list(ALL_CHANNEL_NAMES), cache=False,
    )
    fused, names, meta = pack_corpus_from_pickles(
        wesad_root, SUBJECTS_SMALL, CHANNELS, cache=False,
    )
    assert names == list(ALL_CHANNEL_NAMES)
    assert meta == {"original_fs": 700, "fs": 128, "window_sec": 60,
                    "stride_sec": 10, "include_wrist": False}
    assert fused.subjects == two_step.subjects
    np.testing.assert_array_equal(np.asarray(fused.x), np.asarray(two_step.x))
    np.testing.assert_array_equal(fused.y, two_step.y)
    np.testing.assert_array_equal(fused.mask, two_step.mask)


def test_baseline_normalization_matches(wesad_root, preprocessed):  # noqa: F811
    two_step = pack_corpus(
        preprocessed / "chest_raw", SUBJECTS_SMALL[:2], CHANNELS,
        list(ALL_CHANNEL_NAMES), normalization="baseline", cache=False,
    )
    fused, _, _ = pack_corpus_from_pickles(
        wesad_root, SUBJECTS_SMALL[:2], CHANNELS,
        normalization="baseline", cache=False,
    )
    np.testing.assert_array_equal(np.asarray(fused.x), np.asarray(two_step.x))


def test_pickles_cache_roundtrip(wesad_root, capsys):
    cold, names, meta = pack_corpus_from_pickles(
        wesad_root, SUBJECTS_SMALL[:2], CHANNELS, cache=True,
    )
    capsys.readouterr()
    warm, names2, meta2 = pack_corpus_from_pickles(
        wesad_root, SUBJECTS_SMALL[:2], CHANNELS, cache=True,
    )
    assert "pack cache hit" in capsys.readouterr().out
    assert (names2, meta2) == (names, meta)
    assert warm.subjects == cold.subjects
    np.testing.assert_array_equal(np.asarray(warm.x), np.asarray(cold.x))
    np.testing.assert_array_equal(warm.y, cold.y)
    np.testing.assert_array_equal(warm.mask, cold.mask)


def test_unknown_channel_rejected(wesad_root):
    with pytest.raises(ValueError, match="Unknown channels"):
        pack_corpus_from_pickles(
            wesad_root, SUBJECTS_SMALL[:2], ["chest_ECG", "chest_FOO"],
            cache=False,
        )
    # Wrist channels are valid: requesting any auto-includes the wrist block.
    corpus, names, meta = pack_corpus_from_pickles(
        wesad_root, SUBJECTS_SMALL[:2], ["chest_ECG", "wrist_BVP", "wrist_EDA"],
        cache=False,
    )
    assert meta["include_wrist"] and "wrist_BVP" in names
    assert corpus.x.shape[2] == 3


def test_validation_serial_and_hybrid_rejected():
    cfg = ExperimentConfig(from_pickles="/some/WESAD", fold_execution="serial")
    with pytest.raises(ValueError, match="sharded"):
        validate_experiment(cfg)
    validate_experiment(cfg, fold_execution="sharded")  # ok
    cfg2 = ExperimentConfig(
        from_pickles="/some/WESAD", fold_execution="sharded",
        model=ModelConfig(name="hybrid_cnn_gru"),
        raw_align_path="x", feature_path="y",
    )
    with pytest.raises(ValueError, match="hybrid"):
        validate_experiment(cfg2)


@pytest.mark.slow
def test_cli_sharded_from_pickles(wesad_root, tmp_path):
    """main --execution sharded --from-pickles: full sweep without any npy
    directory, producing the standard run-dir contract. Slow tier: the
    full-length (T=7680) sweep program costs minutes to run on the CPU
    backend; the quick tier pins the staging bit-identity above."""
    from multimodalsignal_tpu.main import main

    cfg_file = tmp_path / "cfg.json"
    cfg_file.write_text(json.dumps({
        "run_name": "from_pickles",
        "subjects": SUBJECTS_SMALL[:3],
        "channels_to_use": CHANNELS,
        "model": {"cnn_out_channels": 8, "gru_hidden_size": 8,
                  "gru_num_layers": 1},
        "trainer": {"epochs": 2, "batch_size": 16,
                    "early_stopping": {"patience": 2}},
    }))
    main(["--config", str(cfg_file), "--execution", "sharded",
          "--from-pickles", str(wesad_root),
          "--output-dir", str(tmp_path / "out")])
    runs = list((tmp_path / "out" / "from_pickles").iterdir())
    assert len(runs) == 1
    summary = (runs[0] / "cv_summary.txt").read_text()
    assert "Mean accuracy" in summary
    echo = json.loads((runs[0] / "config.json").read_text())
    assert echo["preprocess_meta"]["fs"] == 128
    assert echo["from_pickles"] == str(wesad_root)


def test_subject_memo_shared_across_corpora(wesad_root, preprocessed,  # noqa: F811
                                            monkeypatch):
    """The hierarchical sweep packs three corpora (M1/M2/union) from the same
    pickles; a shared subject_cache must preprocess each subject ONCE while
    every pack stays bit-identical to its two-step twin."""
    import multimodalsignal_tpu.data.preprocess as pp
    from multimodalsignal_tpu.data import dataset as ds

    calls = []
    real = pp.preprocess_subject
    monkeypatch.setattr(pp, "preprocess_subject",
                        lambda sid, cfg: (calls.append(sid), real(sid, cfg))[1])
    memo = {}
    subs = SUBJECTS_SMALL[:2]
    c1, _, _ = ds.pack_corpus_from_pickles(
        wesad_root, subs, CHANNELS, "stress_binary",
        subject_cache=memo, cache=False)
    c2, _, _ = ds.pack_corpus_from_pickles(
        wesad_root, subs, ["chest_ECG"], "ternary",
        subject_cache=memo, cache=False)
    assert sorted(calls) == subs  # second pack served from the memo

    two1 = pack_corpus(preprocessed / "chest_raw", subs, CHANNELS,
                       list(ALL_CHANNEL_NAMES), "stress_binary", cache=False)
    two2 = pack_corpus(preprocessed / "chest_raw", subs, ["chest_ECG"],
                       list(ALL_CHANNEL_NAMES), "ternary", cache=False)
    np.testing.assert_array_equal(np.asarray(c1.x), np.asarray(two1.x))
    np.testing.assert_array_equal(c1.y, two1.y)
    np.testing.assert_array_equal(np.asarray(c2.x), np.asarray(two2.x))
    np.testing.assert_array_equal(c2.y, two2.y)
