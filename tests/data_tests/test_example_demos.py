"""The example walkthroughs stay runnable end-to-end (offline).

Each demo is the counterpart of a reference notebook
(reference notebooks/{chip_creator,data_cleaner,data_splitter,
raster_chip_creator}_demo.ipynb); run them as a user would, in a fresh
interpreter (absl flags + the offline catalog stub are process-global).
"""

import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "examples"))

_BOOT = (
    "import jax; jax.config.update('jax_platforms', 'cpu'); "
    "import runpy, sys; script, out = sys.argv[1], sys.argv[2]; "
    "sys.argv = [script, out]; runpy.run_path(script, run_name='__main__')"
)


def _run_demo(name: str, tmp_path, marker: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", _BOOT,
         os.path.join(EXAMPLES, name), str(tmp_path / "out")],
        capture_output=True, text=True, timeout=420,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert marker in proc.stdout, proc.stdout
    return proc.stdout


@pytest.mark.parametrize("name,marker", [
    ("chip_creator_demo.py", "cloud-masked corner is no-data: True"),
    ("data_cleaner_demo.py", "labeled pixels per seg map after limiting"),
    ("data_splitter_demo.py", "splits_locations.png"),
    ("raster_chip_creator_demo.py", "2 chips + 2 seg maps"),
])
def test_demo_runs(name, marker, tmp_path):
    out = _run_demo(name, tmp_path, marker)
    assert "Traceback" not in out
