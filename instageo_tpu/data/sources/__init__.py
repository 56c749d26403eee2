"""Per-source data pipelines: HLS, Sentinel-2, Sentinel-1."""
