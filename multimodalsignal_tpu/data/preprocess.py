"""Offline preprocessing: WESAD pickles -> windowed .npy tensors + features.

Parity target: reference preprocess.py:126-242 (`run_preprocessing`). Output
contract (consumed by the dataset layer and preprocess checker):

  <out>/chest_raw/_channel_names.txt, S*_X.npy [N, T, 8], S*_y.npy [N]
  <out>/chest_raw_align/...           (raw windows padded/truncated to the
                                       feature window count, preprocess.py:224-240)
  <out>/chest_feature/_feature_names.txt, S*_X.npy [N, F], S*_y.npy [N]

Labels are the ORIGINAL protocol labels {1:Base, 2:TSST, 3:Fun, 4:Medi}
(preprocess.py:28,162); classification-mode mapping happens in the dataset
layer, exactly as in the reference.

TPU-first differences from the reference (same outputs, different engine):
  * all six chest sensors resample in one batched FFT instead of per-column
    python loops (resample.py);
  * window extraction is a single strided gather per subject instead of
    per-window list appends (windowing.py);
  * raw and feature targets share one resampled array when their rates match
    (the reference recomputes the identical 128 Hz resample twice).

CLI: python -m multimodalsignal_tpu.data.preprocess --wesad-root ./WESAD --output ./data
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from multimodalsignal_tpu.config import (
    ALL_CHANNEL_NAMES,
    CHEST_SENSORS,
    TASK_TO_LABEL_MAP,
    WRIST_CHANNEL_NAMES,
    WRIST_SENSORS,
    PreprocessConfig,
)
from multimodalsignal_tpu.data.features import FEATURE_NAMES, extract_features_batch
from multimodalsignal_tpu.data.protocol import parse_quest_csv
from multimodalsignal_tpu.data.resample import resample_signal
from multimodalsignal_tpu.data.windowing import (
    segment_protocol,
    sliding_windows_fast,
)
from multimodalsignal_tpu.data.wesad_io import (
    WRIST_RATES,
    chest_signals,
    load_subject_pkl,
    wrist_signals,
)


def _write_names(path: Path, names) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("".join(f"{n}\n" for n in names))


def _resample_all(chest: dict[str, np.ndarray], original_fs: int, target_fs: int) -> np.ndarray:
    """Resample every chest sensor and concatenate to [T', 8] channel-major
    order chest_ACC_{x,y,z}, chest_{ECG,EDA,EMG,Resp,Temp} (preprocess.py:128-129)."""
    cols = []
    for sensor in CHEST_SENSORS:
        sig = np.asarray(chest[sensor])
        if sig.ndim == 1:
            sig = sig[:, None]
        cols.append(resample_signal(sig, original_fs, target_fs))
    return np.concatenate(cols, axis=1)


def _resample_wrist(wrist: dict[str, np.ndarray], target_fs: int,
                    target_len: int) -> np.ndarray:
    """Resample each wrist sensor from ITS native rate onto the common grid
    and trim/pad to the chest grid length -> [target_len, 6]
    (wrist_ACC_{x,y,z}, wrist_BVP, wrist_EDA, wrist_TEMP)."""
    cols = []
    for sensor in WRIST_SENSORS:
        sig = np.asarray(wrist[sensor])
        if sig.ndim == 1:
            sig = sig[:, None]
        res = resample_signal(sig, WRIST_RATES[sensor], target_fs)
        if res.shape[0] < target_len:  # device clocks drift by a few samples
            pad = np.repeat(res[-1:], target_len - res.shape[0], axis=0)
            res = np.concatenate([res, pad], axis=0)
        cols.append(res[:target_len])
    return np.concatenate(cols, axis=1)


def preprocess_subject(
    sid: str,
    cfg: PreprocessConfig,
) -> dict[str, tuple[np.ndarray, np.ndarray]] | None:
    """Produce this subject's arrays per target: {'raw': (X, y), ...}.

    X raw: [N, window_samples, 8]; X feature: [N, F]; y: original labels.
    Returns None when the subject's pickle is missing.
    """
    data = load_subject_pkl(sid, cfg.wesad_root)
    if data is None:
        return None
    protocol = parse_quest_csv(sid, cfg.wesad_root)
    chest = chest_signals(data)
    out: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    want_raw = "raw" in cfg.targets or "raw-align" in cfg.targets
    raw = feat = None
    if want_raw:
        raw = _resample_all(chest, cfg.original_chest_fs, cfg.raw_fs)
        if cfg.include_wrist:
            wrist = wrist_signals(data)
            if wrist is None:
                print(f"Warning: {sid} has no wrist data; "
                      f"wrist channels filled with zeros.")
                raw = np.concatenate(
                    [raw, np.zeros((raw.shape[0], len(WRIST_CHANNEL_NAMES)))],
                    axis=1,
                )
            else:
                raw = np.concatenate(
                    [raw, _resample_wrist(wrist, cfg.raw_fs, raw.shape[0])],
                    axis=1,
                )
    if "feature" in cfg.targets:
        if want_raw and cfg.feature_fs == cfg.raw_fs:
            feat = raw  # identical resample; the reference recomputes it
        else:
            feat = _resample_all(chest, cfg.original_chest_fs, cfg.feature_fs)

    X_raw = None
    if want_raw:
        raw_starts, raw_labels = segment_protocol(
            protocol, TASK_TO_LABEL_MAP, cfg.original_chest_fs, cfg.raw_fs,
            cfg.raw_window_sec, cfg.raw_stride_sec,
        )
        # float32 before the big gather: halves the window copy and the .npy
        # write (the dataset layer casts to float32 regardless); native C++
        # gather when the engine is available.
        X_raw = sliding_windows_fast(raw.astype(np.float32), raw_starts,
                                     cfg.raw_window_samples)
        if "raw" in cfg.targets:
            out["raw"] = (X_raw, raw_labels)

    if "feature" in cfg.targets:
        f_starts, f_labels = segment_protocol(
            protocol, TASK_TO_LABEL_MAP, cfg.original_chest_fs, cfg.feature_fs,
            cfg.feature_window_sec, cfg.feature_stride_sec,
        )
        window_samples = cfg.feature_window_sec * cfg.feature_fs
        # Gather only the 4 feature channels (float64 kept for the
        # scipy-oracle feature math). Per-channel contiguous gathers: windowing
        # each 1-D channel via a strided view copies window_samples-long
        # contiguous runs (memcpy speed) and hands the batch extractor
        # contiguous [N, T] arrays, vs one [N, T, 4] gather whose 4-element
        # rows scatter-copy ~20x slower and whose [:, :, i] slices are strided.
        ch_index = {name: i for i, name in enumerate(ALL_CHANNEL_NAMES)}
        feature_sensors = ("ECG", "EDA", "EMG", "Resp")
        channel_windows = {}
        for s in feature_sensors:
            sig = np.ascontiguousarray(feat[:, ch_index[f"chest_{s}"]])
            if len(f_starts) == 0:
                channel_windows[f"chest_{s}"] = np.empty((0, window_samples), sig.dtype)
                continue
            view = np.lib.stride_tricks.sliding_window_view(sig, window_samples)
            channel_windows[f"chest_{s}"] = view[f_starts]
        X_feat = extract_features_batch(channel_windows, cfg.feature_fs)
        X_feat = np.nan_to_num(X_feat, nan=0.0, posinf=0.0, neginf=0.0)
        out["feature"] = (X_feat, f_labels)

        if "raw-align" in cfg.targets:
            # Pad/truncate raw windows to the feature window count so hybrid
            # training aligns sample-for-sample (preprocess.py:224-240).
            n_feat, n_raw = len(f_labels), len(X_raw)
            if n_raw < n_feat:
                pad = np.repeat(X_raw[-1:], n_feat - n_raw, axis=0)
                X_align = np.concatenate([X_raw, pad], axis=0)
            else:
                X_align = X_raw[:n_feat]
            out["raw-align"] = (X_align, f_labels.copy())
    elif "raw-align" in cfg.targets:
        print(
            f"Warning: 'raw-align' needs 'feature' to align window counts; "
            f"skipping raw-align for {sid}."
        )
    return out


_TARGET_DIRS = {"raw": "chest_raw", "raw-align": "chest_raw_align", "feature": "chest_feature"}


def _process_and_save(args) -> list[str]:
    """Worker: one subject end-to-end (module-level for multiprocessing)."""
    sid, cfg, output = args
    result = preprocess_subject(sid, cfg)
    if result is None:
        return []
    lines = []
    for target, (X, y) in result.items():
        d = Path(output) / _TARGET_DIRS[target]
        np.save(d / f"{sid}_X.npy", X)
        np.save(d / f"{sid}_y.npy", y)
        lines.append(f"  - {sid} ({target}): saved {len(y)} windows, X shape {X.shape}")
    return lines


def run_preprocessing(cfg: PreprocessConfig, workers: int = 0) -> None:
    """Process all subjects and write npy outputs + name files.

    workers > 1 fans subjects across processes (the per-window feature math
    is host-CPU bound; subjects are embarrassingly parallel — the reference
    loops them serially under tqdm, preprocess.py:138)."""
    output = Path(cfg.output_path)
    channel_names = list(ALL_CHANNEL_NAMES)
    if cfg.include_wrist:
        channel_names += list(WRIST_CHANNEL_NAMES)
    for target in cfg.targets:
        d = output / _TARGET_DIRS[target]
        d.mkdir(parents=True, exist_ok=True)
        if target in ("raw", "raw-align"):
            _write_names(d / "_channel_names.txt", channel_names)
            # Serving-time contract: the Predictor replays this windowing on
            # raw recordings, so persist the parameters next to the data
            # instead of hardcoding 700->128 Hz / 60 s / 10 s downstream.
            import json

            (d / "_preprocess_meta.json").write_text(json.dumps({
                "original_fs": cfg.original_chest_fs,
                "fs": cfg.raw_fs,
                "window_sec": cfg.raw_window_sec,
                "stride_sec": cfg.raw_stride_sec,
                "include_wrist": cfg.include_wrist,
            }, indent=2) + "\n")
        else:
            _write_names(d / "_feature_names.txt", FEATURE_NAMES)
            # Train/serve skew guard: stamp which extractor produced these
            # cached features so hybrid deployments can verify the live
            # extractor matches (data/features.py FEATURE_EXTRACTOR_VERSION).
            import json

            from multimodalsignal_tpu.data.features import (
                FEATURE_EXTRACTOR_VERSION,
            )

            (d / "_preprocess_meta.json").write_text(json.dumps({
                "feature_extractor_version": FEATURE_EXTRACTOR_VERSION,
            }, indent=2) + "\n")

    jobs = [(sid, cfg, str(output)) for sid in cfg.subjects]
    if workers and workers > 1 and len(jobs) > 1:
        import multiprocessing as mp

        with mp.get_context("spawn").Pool(min(workers, len(jobs))) as pool:
            for lines in pool.imap(_process_and_save, jobs):
                for line in lines:
                    print(line)
    else:
        for job in jobs:
            for line in _process_and_save(job):
                print(line)
    print("Preprocessing complete.")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wesad-root", default="./WESAD")
    p.add_argument("--output", default="./data")
    p.add_argument(
        "--targets", nargs="+", default=["raw", "raw-align", "feature"],
        choices=list(_TARGET_DIRS),
    )
    p.add_argument("--subjects", nargs="*", default=None)
    p.add_argument("--workers", type=int, default=0,
                   help="process this many subjects in parallel (0 = serial)")
    p.add_argument("--include-wrist", action="store_true",
                   help="also window the wrist device's channels "
                        "(BVP/EDA/TEMP/ACC, each resampled from its native rate)")
    args = p.parse_args(argv)
    cfg = PreprocessConfig(
        wesad_root=args.wesad_root,
        output_path=args.output,
        targets=tuple(args.targets),
        subjects=tuple(args.subjects) if args.subjects else PreprocessConfig.subjects,
        include_wrist=args.include_wrist,
    )
    run_preprocessing(cfg, workers=args.workers)


if __name__ == "__main__":
    main()
