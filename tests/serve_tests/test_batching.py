"""Dynamic micro-batcher tests: coalescing, bucketing, errors, e2e."""

import threading
import time

import numpy as np
import pytest

from instageo_tpu.serve.batching import DynamicBatcher


def test_results_routed_to_each_request():
    calls = []

    def predict(x):
        calls.append(x.shape[0])
        return x.sum(axis=(1, 2))  # per-example scalar-ish result

    b = DynamicBatcher(predict, max_batch=8, max_wait_ms=20)
    xs = [np.full((2, 3), i, np.float32) for i in range(10)]
    futs = [b.submit(x) for x in xs]
    outs = [f.result(timeout=10) for f in futs]
    b.close()
    for i, o in enumerate(outs):
        assert o == pytest.approx(6.0 * i)
    # 10 concurrent submits must NOT run as 10 separate device calls.
    assert sum(calls) >= 10
    assert len(calls) < 10


def test_bucket_padding_shapes():
    shapes = []

    def predict(x):
        shapes.append(x.shape[0])
        return x.sum(axis=1)

    b = DynamicBatcher(predict, max_batch=8, max_wait_ms=30)
    futs = [b.submit(np.full((4,), i, np.float32)) for i in range(3)]
    results = [f.result(timeout=10) for f in futs]
    b.close()
    # 3 requests ride bucketed programs: every executed batch is a
    # power-of-two bucket, never a raw odd size.
    assert all(s in (1, 2, 4, 8) for s in shapes)
    # Padding must NOT leak into results: request i gets ITS row back.
    for i, r in enumerate(results):
        assert r == pytest.approx(4.0 * i)


def test_error_propagates_to_waiters():
    def predict(x):
        raise ValueError("boom")

    b = DynamicBatcher(predict, max_batch=4, max_wait_ms=5)
    fut = b.submit(np.ones((2,)))
    with pytest.raises(ValueError, match="boom"):
        fut.result(timeout=10)
    b.close()


def test_close_fails_pending_and_rejects_new():
    release = threading.Event()

    def predict(x):
        release.wait(5)
        return np.zeros((x.shape[0],))

    b = DynamicBatcher(predict, max_batch=1, max_wait_ms=1)
    first = b.submit(np.ones((1,)))   # occupies the worker
    time.sleep(0.1)
    pending = b.submit(np.ones((1,)))  # queued behind it
    # Begin close() BEFORE releasing the worker: _closed is set first, so
    # the worker exits after `first` and can never consume `pending`.
    closer = threading.Thread(target=b.close)
    closer.start()
    time.sleep(0.1)
    release.set()
    closer.join(10)
    first.result(timeout=10)
    # The queued-but-never-run request must FAIL, not hang forever.
    with pytest.raises(RuntimeError, match="closed"):
        pending.result(timeout=10)
    with pytest.raises(RuntimeError):
        b.submit(np.ones((1,)))


def test_model_server_online_inference(tmp_path):
    """Online predictions equal the direct batched predict path."""
    import jax

    from instageo_tpu.configs.config import load_config
    from instageo_tpu.serve.infer import make_predict_fn
    from instageo_tpu.serve.server import ModelServer
    from instageo_tpu.train.factory import create_model

    cfg = load_config("config", overrides={
        "dataloader.img_size": 32,
        "dataloader.bands": [0, 1, 2, 3, 4, 5],
        "model.model_name": "prithvi_eo_tiny",
        "model.load_pretrained_weights": False,
        "tpu.precision": "f32",
    })
    server = ModelServer.__new__(ModelServer)  # skip checkpoint loading
    server.cfg = cfg
    server.model, server.variables = create_model(cfg)

    rng = np.random.default_rng(0)
    chips = [rng.normal(size=(6, 1, 32, 32)).astype(np.float32)
             for _ in range(5)]

    batcher = server.online_batcher(max_batch=4, max_wait_ms=10)
    futs = [batcher.submit(c) for c in chips]
    online = [np.asarray(f.result(timeout=60)) for f in futs]

    direct = np.asarray(make_predict_fn(server.model, server.variables)(
        np.stack(chips)))
    for i in range(5):
        np.testing.assert_array_equal(online[i], direct[i])
    batcher.close()


def test_shape_mismatch_fails_batch_not_worker():
    """A shape-mismatched request fails its own batch; the worker
    survives and keeps serving later requests."""
    def predict(x):
        return x.sum(axis=1)

    b = DynamicBatcher(predict, max_batch=8, max_wait_ms=20)
    bad = [b.submit(np.ones((2,))), b.submit(np.ones((3,)))]
    got_exc = 0
    for f in bad:
        try:
            f.result(timeout=10)
        except ValueError:
            got_exc += 1
    assert got_exc >= 1  # the coalesced batch failed cleanly
    # Worker still alive and serving.
    ok = b.submit(np.ones((4,)))
    assert ok.result(timeout=10) == pytest.approx(4.0)
    b.close()


def test_buckets_max_batch_conflict_raises():
    from instageo_tpu.serve.batching import DynamicBatcher

    import pytest
    with pytest.raises(ValueError, match="conflicts"):
        b = DynamicBatcher(lambda x: x, max_batch=64, buckets=[8, 16])
    # buckets-only: largest bucket is the cap, no default conflict.
    b = DynamicBatcher(lambda x: x, buckets=[8, 16])
    assert b.max_batch == 16
    b.close()
