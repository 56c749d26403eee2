"""Prediction-map visualization: GeoTIFF -> thresholded overlay on a map.

Re-implements ``instageo/apps/viz.py`` without plotly/datashader/streamlit:
rasters are reprojected to EPSG:3857, values thresholded to the (0.8, 1]
band and shaded with the Reds colormap (reference viz.py:46-116), and the
result is emitted as a self-contained Leaflet HTML page (base64 image
overlays; map tiles from the standard OSM CDN in the viewer's browser).
"""

from __future__ import annotations

import base64
import io
import json
import os
from typing import Sequence, Tuple

import numpy as np
from PIL import Image

from instageo_tpu.data.crs import Transformer
from instageo_tpu.data.geotiff import GeoTiffReader

_REDS = [
    (255, 245, 240), (254, 224, 210), (252, 187, 161), (252, 146, 114),
    (251, 106, 74), (239, 59, 44), (203, 24, 29), (165, 15, 21), (103, 0, 13),
]


def _reds_colormap(values: np.ndarray, alpha: int = 200) -> np.ndarray:
    """Map values in [0, 1] to the Reds ramp; NaN -> transparent."""
    idx = np.clip((values * (len(_REDS) - 1)), 0, len(_REDS) - 1)
    idx = np.where(np.isnan(values), 0, idx).astype(int)
    ramp = np.asarray(_REDS, np.uint8)
    rgba = np.zeros(values.shape + (4,), np.uint8)
    rgba[..., :3] = ramp[idx]
    rgba[..., 3] = np.where(np.isnan(values), 0, alpha)
    return rgba


def read_geotiff_to_overlay(
    path: str,
    threshold: Tuple[float, float] = (0.8, 1.0),
    max_size: int = 1024,
) -> Tuple[np.ndarray, Tuple[float, float, float, float]]:
    """Raster -> (RGBA overlay, WGS84 bounds), thresholded like the reference.

    Values outside (threshold_lo, threshold_hi] become transparent
    (reference viz.py:46-116 maps (0.8, 1] through Reds).
    """
    with GeoTiffReader(path) as r:
        data = r.read(1).astype(np.float64)
        nodata = r.nodata
        t = r.transform
        crs = r.crs or 4326
        w, h = r.width, r.height
    if nodata is not None:
        data = np.where(data == nodata, np.nan, data)
    step = max(1, max(data.shape) // max_size)
    data = data[::step, ::step]

    lo, hi = threshold
    vals = np.where((data > lo) & (data <= hi), data, np.nan)
    overlay = _reds_colormap(vals)

    xs = [t.c, t.c + w * t.a]
    ys = [t.f, t.f + h * t.e]
    if crs != 4326:
        tr = Transformer.from_crs(crs, 4326, always_xy=True)
        lons, lats = [], []
        for x in xs:
            for y in ys:
                lon, lat = tr.transform(x, y)
                lons.append(float(lon))
                lats.append(float(lat))
        bounds = (min(lats), min(lons), max(lats), max(lons))
    else:
        bounds = (min(ys), min(xs), max(ys), max(xs))
    return overlay, bounds


def _png_b64(rgba: np.ndarray) -> str:
    buf = io.BytesIO()
    Image.fromarray(rgba, "RGBA").save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>InstaGeo-TPU Map</title>
<link rel="stylesheet"
 href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css"/>
<script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>
<style>html,body,#map{{height:100%;margin:0}}</style></head>
<body><div id="map"></div><script>
var map = L.map('map');
L.tileLayer('https://tile.openstreetmap.org/{{z}}/{{x}}/{{y}}.png',
  {{maxZoom: 18, attribution: '&copy; OpenStreetMap'}}).addTo(map);
var overlays = {overlays_json};
var group = L.featureGroup();
overlays.forEach(function(o) {{
  L.imageOverlay('data:image/png;base64,' + o.png,
    [[o.bounds[0], o.bounds[1]], [o.bounds[2], o.bounds[3]]],
    {{opacity: 0.85}}).addTo(map);
  group.addLayer(L.rectangle(
    [[o.bounds[0], o.bounds[1]], [o.bounds[2], o.bounds[3]]],
    {{weight: 0, fillOpacity: 0}}));
}});
group.addTo(map);
if (overlays.length) map.fitBounds(group.getBounds()); else map.setView([0,0],2);
</script></body></html>
"""


def create_map_with_geotiff_tiles(
    tiles_to_overlay: Sequence[str],
    out_html: str,
    threshold: Tuple[float, float] = (0.8, 1.0),
) -> str:
    """Render prediction GeoTIFFs onto a Leaflet map HTML file.

    Surface equivalent of the reference's plotly mapbox figure builder
    (viz.py:46-159).
    """
    overlays = []
    for path in tiles_to_overlay:
        try:
            rgba, bounds = read_geotiff_to_overlay(path, threshold)
        except Exception:
            continue
        overlays.append({
            "png": _png_b64(rgba),
            "bounds": [bounds[0], bounds[1], bounds[2], bounds[3]],
            "name": os.path.basename(path),
        })
    html = _HTML_TEMPLATE.format(overlays_json=json.dumps(overlays))
    with open(out_html, "w") as f:
        f.write(html)
    return out_html
