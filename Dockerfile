# Container image (reference parity: the upstream Dockerfile builds the C++
# lib + python binding; here the package is pure python with an optional
# native helper compiled at build time). For real TPU VMs, base on a
# libtpu-enabled image and install jax[tpu] instead.
FROM python:3.11-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential make && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY fastllama_tpu ./fastllama_tpu
COPY tools ./tools
COPY examples ./examples

RUN pip install --no-cache-dir -e ".[convert]" && \
    make -C fastllama_tpu/native || true

ENTRYPOINT ["python", "tools/chat.py"]
