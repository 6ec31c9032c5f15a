"""Packaging smoke: every console entry point declared in pyproject.toml
[project.scripts] must resolve to a real callable and answer `--help`
(reference README.md:67,92 documents a CLI-first workflow; ours ships the
same surface as installed commands).

The environment does not pip-install the package (it runs from PYTHONPATH),
so this test validates the exact contract `pip install -e .` relies on: the
"module:attr" targets import and behave as argparse CLIs — in ONE child
process (one jax import) rather than five.
"""

import json
import subprocess
import sys
import tomllib
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_DRIVER = r"""
import contextlib, importlib, io, json, sys

results = {}
for name, target in json.loads(sys.argv[1]).items():
    mod_name, _, attr = target.partition(":")
    entry = getattr(importlib.import_module(mod_name), attr)
    out = io.StringIO()
    code = "no-exit"
    try:
        with contextlib.redirect_stdout(out):
            entry(["--help"])
    except SystemExit as e:
        code = e.code or 0
    results[name] = {"exit": code, "help": out.getvalue()}
print("PACKAGING_JSON:" + json.dumps(results))
"""


def test_console_entry_points_resolve_and_help():
    scripts = tomllib.loads(
        (REPO / "pyproject.toml").read_text())["project"]["scripts"]
    # The six documented commands must all be declared.
    assert set(scripts) == {"mms-train", "mms-preprocess", "mms-serve",
                            "mms-predict", "mms-export", "mms-stream"}, scripts

    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER, json.dumps(scripts)],
        capture_output=True, text=True, timeout=300,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
             "HOME": "/root", "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    payload = [line for line in proc.stdout.splitlines()
               if line.startswith("PACKAGING_JSON:")]
    assert payload, proc.stdout
    results = json.loads(payload[0][len("PACKAGING_JSON:"):])
    for name, r in results.items():
        # argparse --help exits 0 and prints a usage banner.
        assert r["exit"] == 0, (name, r)
        assert "usage" in r["help"].lower(), (name, r["help"][:200])
        assert "--help" in r["help"] or "-h" in r["help"], name


def test_package_data_ships_native_sources():
    """The ctypes native engine compiles its C++ at import time from the
    installed tree; package-data must therefore include the .cpp sources."""
    cfg = tomllib.loads((REPO / "pyproject.toml").read_text())
    pkg_data = cfg["tool"]["setuptools"]["package-data"]
    assert "*.cpp" in pkg_data["multimodalsignal_tpu.native"]
    assert list((REPO / "multimodalsignal_tpu" / "native").glob("*.cpp")), (
        "native package has no .cpp sources on disk")
