"""The benchmark harnesses stay runnable (API-drift guard).

bench.py runs on the real TPU only (the driver's gate); bench_suite's
CPU path is cheap enough to smoke here — it exercises the same Trainer/
ops/serve APIs, so a signature drift breaks this test instead of the
driver's round-end bench run.
"""

import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def test_bench_suite_quick_cpu():
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import sys; sys.argv.append('--quick'); "
        f"sys.path.insert(0, {REPO!r}); "
        "import runpy; runpy.run_path("
        f"{os.path.join(REPO, 'benchmarks', 'bench_suite.py')!r}, "
        "run_name='__main__')"
    )
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=900,
                          env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stdout + proc.stderr
    metrics = [json.loads(line) for line in proc.stdout.splitlines()
               if line.startswith("{")]
    names = {m["metric"] for m in metrics}
    # The attention A/B runs only on real TPU hardware (Pallas kernel).
    assert {"native_decode_throughput", "chip_math_throughput",
            "prithvi_train_step_throughput",
            "host_ingest_throughput", "host_ingest_throughput_cached",
            "granule_stream_throughput",
            "e2e_train_pipeline_throughput"} <= names, names
    assert all(m["value"] > 0 for m in metrics)
