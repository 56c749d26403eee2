# syntax = docker/dockerfile:1.2
# Container image for the web platform + queue workers (reference root
# Dockerfile equivalent — CUDA/GDAL there; plain python + optional
# libtpu here, since the framework ships its own codec/CRS stack).
#
# Build args:
#   JAX_TARGET=cpu  (default) — API server, data/visualization workers
#   JAX_TARGET=tpu            — model-prediction worker on a TPU VM
FROM python:3.12-slim

ENV LANG=C.UTF-8 PYTHONDONTWRITEBYTECODE=1 PYTHONUNBUFFERED=1 \
    PIP_NO_CACHE_DIR=1

# build-essential: compiles the native C++ batch GeoTIFF decoder
# (instageo_tpu/native) lazily at first use.
RUN apt-get update && \
    apt-get install -y --no-install-recommends build-essential && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY instageo_tpu ./instageo_tpu

ARG JAX_TARGET=cpu
RUN pip install . && \
    if [ "$JAX_TARGET" = "tpu" ]; then \
        pip install "jax[tpu]" \
            -f https://storage.googleapis.com/jax-releases/libtpu_releases.html; \
    fi

# Pre-build the native decoder so workers don't pay the compile at runtime.
RUN make -C instageo_tpu/native || true

EXPOSE 8000
CMD ["python", "-m", "instageo_tpu.webapp.main"]
