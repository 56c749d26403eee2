"""Telemetry + experiment logger tests."""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from instageo_tpu.utils.experiment_logger import ExperimentLogger
from instageo_tpu.utils.telemetry import (
    EmissionsTracker,
    StepTimer,
    count_params,
    get_model_complexity,
)


def test_model_complexity_from_xla():
    def f(a, b):
        return a @ b

    a = jnp.zeros((128, 256))
    b = jnp.zeros((256, 64))
    c = get_model_complexity(f, a, b)
    # matmul flops = 2*M*N*K
    assert c["flops"] >= 2 * 128 * 256 * 64 * 0.9
    assert c["gflops"] > 0


def test_count_params():
    tree = {"a": jnp.zeros((3, 4)), "b": {"c": jnp.zeros(5)}}
    assert count_params(tree) == 17


def test_emissions_tracker(tmp_path):
    with EmissionsTracker(name="t", output_dir=str(tmp_path)) as tr:
        time.sleep(0.05)
    assert tr.results["duration_s"] >= 0.05
    assert tr.results["energy_kwh"] > 0
    assert tr.results["emissions_kg"] > 0
    assert os.path.exists(tmp_path / "t_emissions.json")


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        t.start()
        time.sleep(0.01)
        t.stop()
    s = t.summary()
    assert s["steps"] == 3 and s["mean_s"] >= 0.01


def test_experiment_logger(tmp_path):
    lg = ExperimentLogger(str(tmp_path), name="test-run")
    lg.log_metrics({"loss": 1.0, "iou": 0.5}, step=0)
    lg.log_metrics({"loss": 0.8}, step=1)
    lg.stop()
    lines = [json.loads(line) for line in open(tmp_path / "metrics.jsonl")]
    assert len(lines) == 2
    assert lines[0]["loss"] == 1.0 and lines[0]["_step"] == 0
    assert os.path.exists(tmp_path / "run_meta.json")


def test_profile_trace_writes_capture(tmp_path):
    """profile_trace captures a real jax.profiler trace (validated on the
    TPU too: xplane.pb + trace.json.gz written through the relay)."""
    import glob

    import jax
    import jax.numpy as jnp

    from instageo_tpu.utils.telemetry import profile_trace

    f = jax.jit(lambda x: (x * 2).sum())
    float(f(jnp.ones((8, 8))))
    with profile_trace(str(tmp_path / "trace"), enabled=True):
        float(f(jnp.ones((8, 8))))
    files = [p for p in glob.glob(str(tmp_path / "trace" / "**" / "*"),
                                  recursive=True) if os.path.isfile(p)]
    assert files, "no trace files written"
    # disabled -> no capture, no directory side effects
    with profile_trace(str(tmp_path / "off"), enabled=False):
        float(f(jnp.ones((8, 8))))
    assert not glob.glob(str(tmp_path / "off" / "**" / "*"), recursive=True)
