"""Shared utilities: run-directory management and tee logging.

The reference scatters these concerns across its scripts (run-dir creation
main.py:73-75, file+stdout logging trainer.py:113-117); here they are one
module reused by the trainer, orchestrators and CLI."""

from multimodalsignal_tpu.utils.run import TeeLogger, make_run_dir

__all__ = ["TeeLogger", "make_run_dir"]
