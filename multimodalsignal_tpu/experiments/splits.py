"""LOSO fold construction with exact reference split parity.

Parity target: reference main.py:98-103 — for each held-out test subject, the
remaining subjects are split 80/20 into train/val with
sklearn.train_test_split(..., test_size=0.2, random_state=SEED). Fold-level
comparability with the reference requires reproducing those splits exactly,
so we call sklearn when present and otherwise replicate its ShuffleSplit
algorithm (permutation by a seeded legacy RandomState; first ceil(test_size*n)
permuted entries become the validation set).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

import numpy as np


@dataclass(frozen=True)
class FoldSpec:
    """One LOSO fold: which subject is held out and how the rest split."""

    test_subject: str
    train_subjects: tuple[str, ...]
    val_subjects: tuple[str, ...]


def _numpy_train_val_split(
    subjects: Sequence[str], val_fraction: float, seed: int
) -> tuple[list[str], list[str]]:
    """sklearn ShuffleSplit replica: legacy-RandomState permutation; the first
    ceil(test_size*n) permuted entries are validation, the rest training
    (matches train_test_split output order exactly)."""
    n = len(subjects)
    n_val = int(math.ceil(val_fraction * n))
    perm = np.random.RandomState(seed).permutation(n)
    val_idx = perm[:n_val]
    train_idx = perm[n_val : n_val + (n - n_val)]
    return [subjects[i] for i in train_idx], [subjects[i] for i in val_idx]


def train_val_split(
    subjects: Sequence[str], val_fraction: float = 0.2, seed: int = 42
) -> tuple[list[str], list[str]]:
    """sklearn.model_selection.train_test_split parity for a list of subjects."""
    try:
        from sklearn.model_selection import train_test_split

        train, val = train_test_split(
            list(subjects), test_size=val_fraction, random_state=seed
        )
        return list(train), list(val)
    except ImportError:
        return _numpy_train_val_split(subjects, val_fraction, seed)


def loso_folds(
    subjects: Sequence[str], val_fraction: float = 0.2, seed: int = 42
) -> list[FoldSpec]:
    """All leave-one-subject-out folds (reference main.py:98-103 loop)."""
    folds = []
    for test_subject in subjects:
        rest = [s for s in subjects if s != test_subject]
        train, val = train_val_split(rest, val_fraction, seed)
        folds.append(FoldSpec(test_subject, tuple(train), tuple(val)))
    return folds
