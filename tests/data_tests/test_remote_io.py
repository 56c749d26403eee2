"""HTTP range-read file tests with a mocked server."""

import numpy as np
import pytest

from instageo_tpu.data import remote_io
from instageo_tpu.data.geotiff import write_geotiff


class FakeSession:
    """Serves a bytes payload via Range requests."""

    def __init__(self, payload: bytes):
        self.payload = payload
        self.range_requests = []

    def get(self, url, headers=None, timeout=None):
        rng = (headers or {}).get("Range", "bytes=0-")
        start, end = rng.replace("bytes=", "").split("-")
        start = int(start)
        end = min(int(end) + 1 if end else len(self.payload), len(self.payload))
        self.range_requests.append((start, end))
        body = self.payload[start:end]

        class R:
            status_code = 206
            headers = {"Content-Range": f"bytes {start}-{end-1}/{len(self.payload)}"}
            content = body

            def raise_for_status(self):
                pass

        return R()

    def head(self, url, headers=None, timeout=None):
        class R:
            headers = {"Content-Length": str(len(self.payload))}

        return R()


def test_httpfile_read_seek(tmp_path):
    payload = bytes(range(256)) * 64  # 16 KiB
    f = remote_io.HttpFile("http://x/y", session=FakeSession(payload),
                           block_size=1024)
    assert f.read(10) == payload[:10]
    f.seek(5000)
    assert f.read(100) == payload[5000:5100]
    f.seek(-16, 2)  # SEEK_END
    assert f.read(16) == payload[-16:]
    assert f.size == len(payload)


def test_httpfile_block_caching():
    payload = b"a" * 4096
    sess = FakeSession(payload)
    f = remote_io.HttpFile("http://x/y", session=sess, block_size=1024)
    f.read(100)
    f.seek(0)
    f.read(100)  # same block -> no new request
    assert len(sess.range_requests) == 1
    f.seek(3000)
    f.read(10)
    assert len(sess.range_requests) == 2


def test_open_remote_geotiff(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 10000, size=(3, 33, 47)).astype(np.uint16)
    p = str(tmp_path / "remote.tif")
    write_geotiff(p, arr, compress="deflate")
    payload = open(p, "rb").read()

    sess = FakeSession(payload)
    from instageo_tpu.data.geotiff import GeoTiffReader

    f = remote_io.HttpFile("http://x/remote.tif", session=sess, block_size=2048)
    r = GeoTiffReader("http://x/remote.tif", fp=f)
    out = r.read()
    np.testing.assert_array_equal(out, arr)
    # ranged access, not a full download in one request
    assert all(e - s <= 2048 for s, e in sess.range_requests)
