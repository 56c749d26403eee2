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
    ("multichip_training.py", "multichip walkthrough OK"),
    ("quickstart.py", "map.html in a browser"),
])
def test_demo_runs(name, marker, tmp_path):
    out = _run_demo(name, tmp_path, marker)
    assert "Traceback" not in out


def test_us_cdl_records_utility(tmp_path):
    """experiments/utils/create_us_cdl_records.py windows a CDL raster
    into label rasters + the records CSV raster_chip_creator consumes."""
    import numpy as np
    import pandas as pd

    from instageo_tpu.data.geotiff import Affine, GeoTiffReader, write_geotiff

    cdl = np.zeros((96, 96), np.uint8)
    cdl[:40, :40] = 5   # one crop region
    cdl[60:, 60:] = 24  # another
    raster = tmp_path / "cdl.tif"
    write_geotiff(str(raster), cdl[None],
                  transform=Affine.from_origin(500000, 4500000, 30, 30),
                  crs=32633, nodata=0)

    script = os.path.join(EXAMPLES, "..", "experiments", "utils",
                          "create_us_cdl_records.py")
    out_labels = tmp_path / "labels"
    records = tmp_path / "records.csv"
    proc = subprocess.run(
        [sys.executable, script, "--raster-path", str(raster),
         "--records-file", str(records), "--date", "2024-09-01",
         "--output-path", str(out_labels), "--window-size", "48"],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": os.path.join(EXAMPLES, "..")})
    assert proc.returncode == 0, proc.stdout + proc.stderr

    df = pd.read_csv(records)
    # 2x2 grid of 48px windows; the two all-zero windows are skipped.
    assert sorted(df["label_filename"]) == ["cdl_window_0_0.tif",
                                            "cdl_window_48_48.tif"]
    assert (df["date"] == "2024-09-01").all()
    with GeoTiffReader(str(out_labels / "cdl_window_48_48.tif")) as r:
        arr = r.read(1)
        assert (arr[12:, 12:] == 24).all()
        # Window georeferencing is shifted by 48 px in both axes.
        x, y = r.transform * (0, 0)
        assert (x, y) == (500000 + 48 * 30, 4500000 - 48 * 30)
