"""HTTP range-read file objects for remote COGs.

The reference reads COGs lazily via GDAL's vsicurl + stackstac
(``instageo/data/stac_utils.py:452-505``); here a small file-like object
serves our GeoTIFF codec with HTTP Range requests, merged-block caching, and
retry — the same access pattern (header read, then per-tile/strip ranges).
"""

from __future__ import annotations

import io
import logging
import os
from typing import Dict, Optional

import requests

from instageo_tpu.utils.ratelimit import retry_backoff

log = logging.getLogger(__name__)

_BLOCK = 1 << 20  # 1 MiB cache blocks


class HttpFile(io.RawIOBase):
    """Seekable read-only file over HTTP Range requests with block caching."""

    def __init__(self, url: str, session: Optional[requests.Session] = None,
                 headers: Optional[Dict[str, str]] = None,
                 block_size: int = _BLOCK) -> None:
        super().__init__()
        self.url = url
        self.session = session or requests.Session()
        self.headers = dict(headers or {})
        self.block_size = block_size
        self._pos = 0
        self._size: Optional[int] = None
        self._cache: Dict[int, bytes] = {}

    @retry_backoff((requests.RequestException,), max_tries=5, max_time=300)
    def _fetch(self, start: int, end: int) -> bytes:
        headers = {**self.headers, "Range": f"bytes={start}-{end - 1}"}
        r = self.session.get(self.url, headers=headers, timeout=60)
        r.raise_for_status()
        if self._size is None:
            cr = r.headers.get("Content-Range", "")
            if "/" in cr:
                try:
                    self._size = int(cr.rsplit("/", 1)[1])
                except ValueError:
                    pass
        return r.content

    def _block(self, idx: int) -> bytes:
        if idx not in self._cache:
            start = idx * self.block_size
            self._cache[idx] = self._fetch(start, start + self.block_size)
        return self._cache[idx]

    @property
    def size(self) -> int:
        if self._size is None:
            r = self.session.head(self.url, headers=self.headers, timeout=60)
            self._size = int(r.headers.get("Content-Length", 0)) or None
            if self._size is None:
                self._block(0)
        return self._size or 0

    # io protocol ----------------------------------------------------------
    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def seek(self, pos: int, whence: int = os.SEEK_SET) -> int:
        if whence == os.SEEK_SET:
            self._pos = pos
        elif whence == os.SEEK_CUR:
            self._pos += pos
        elif whence == os.SEEK_END:
            self._pos = self.size + pos
        return self._pos

    def tell(self) -> int:
        return self._pos

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self.size - self._pos
        out = bytearray()
        pos = self._pos
        end = pos + n
        while pos < end:
            bi = pos // self.block_size
            block = self._block(bi)
            off = pos - bi * self.block_size
            take = min(end - pos, len(block) - off)
            if take <= 0:
                break
            out += block[off : off + take]
            pos += take
        self._pos = pos
        return bytes(out)


def open_remote_geotiff(url: str, headers: Optional[Dict[str, str]] = None):
    """Open a remote COG with the framework GeoTIFF reader."""
    from instageo_tpu.data.geotiff import GeoTiffReader

    return GeoTiffReader(url, fp=HttpFile(url, headers=headers))
