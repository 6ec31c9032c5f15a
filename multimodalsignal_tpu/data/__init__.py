from multimodalsignal_tpu.data.protocol import parse_quest_csv
from multimodalsignal_tpu.data.wesad_io import load_subject_pkl
from multimodalsignal_tpu.data.resample import fourier_resample, resample_signal
from multimodalsignal_tpu.data.windowing import sliding_windows, window_starts

__all__ = [
    "parse_quest_csv",
    "load_subject_pkl",
    "fourier_resample",
    "resample_signal",
    "sliding_windows",
    "window_starts",
]
