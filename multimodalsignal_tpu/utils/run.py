"""Run-directory + logging utilities.

Parity targets: reference main.py:73-75 (output/<run_name>/run_<timestamp>/)
and trainer.py:113-117 (messages teed to stdout and a log file).
"""

from __future__ import annotations

import os
import time
from pathlib import Path


def host_cpu_fingerprint() -> str:
    """Short digest of the host CPU's feature set.

    XLA:CPU cache entries embed AOT machine code compiled for the build
    host's exact features; this environment's home dir survives host
    migrations, so a cache written on a wider-featured machine would load
    with "could lead to SIGILL" warnings on a narrower one. Partitioning
    CPU-backend caches by this fingerprint makes stale-host entries
    unreachable instead of trusted. (TPU executables target the chip, not
    the host — their cache must NOT be partitioned this way, or every host
    migration would re-pay the ~10-minute remote compile.)"""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
            else:
                feats = platform.processor()
    except OSError:
        feats = platform.processor()
    return hashlib.sha256(feats.encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: Path | str | None = None) -> None:
    """Turn on JAX's persistent XLA compilation cache.

    The first compile of the all-folds epoch program over a tunneled remote
    TPU runtime is ~10 minutes (benchmarks/RESULTS.md); with the persistent
    cache, later PROCESSES (ablation grid points, resumed runs, bench reruns)
    reload the serialized executable in seconds instead of recompiling.
    Called by every CLI entry point; honors an explicit
    JAX_COMPILATION_CACHE_DIR. On the CPU backend the cache is partitioned
    per host-CPU fingerprint (see host_cpu_fingerprint).
    """
    import jax

    path = Path(
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or Path.home() / ".cache" / "multimodalsignal_tpu" / "xla_cache"
    )
    # default_backend() initializes the backend — fine at CLI-entry time
    # (the platform choice is already fixed by env/config by then).
    if jax.default_backend() == "cpu":
        path = path / f"cpu_{host_cpu_fingerprint()}"
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    # Default thresholds skip small-but-slow-to-compile entries; cache all.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def make_run_dir(output_root: Path | str, run_name: str) -> Path:
    """Create output/<run_name>/run_<timestamp>/ (reference main.py:73-75).

    MMS_RUN_ID overrides the timestamp so every process of a multi-host
    launch computes the SAME run directory (parallel/multihost.py). It is
    honored ONLY alongside the multi-host env (MMS_NUM_PROCESSES): a stale
    exported MMS_RUN_ID must not make later single-host runs silently reuse
    (and overwrite) an existing run directory."""
    run_id = None
    if os.environ.get("MMS_NUM_PROCESSES"):
        run_id = os.environ.get("MMS_RUN_ID")
    run_dir = (Path(output_root) / run_name
               / f"run_{run_id or time.strftime('%Y%m%d_%H%M%S')}")
    run_dir.mkdir(parents=True, exist_ok=True)
    return run_dir


class TeeLogger:
    """Tee messages to stdout and a log file (reference trainer.py:113-117).

    With append=True an existing log is preserved and the header is appended
    as a banner instead of truncating — so a resumed run (TrainerConfig.resume)
    keeps the epochs logged before the resume point.
    """

    def __init__(self, log_file: Path | str, header: str | None = None,
                 append: bool = False):
        self.log_file = Path(log_file)
        self.log_file.parent.mkdir(parents=True, exist_ok=True)
        if header is not None:
            if append and self.log_file.exists():
                with open(self.log_file, "a") as f:
                    f.write("\n--- " + header + " ---\n")
            else:
                self.log_file.write_text(header + "\n" + "=" * 50 + "\n")

    def __call__(self, message: str) -> None:
        print(message)
        with open(self.log_file, "a") as f:
            f.write(message + "\n")
