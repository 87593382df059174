#!/bin/sh
# Local CI entry: run exactly what .github/workflows/ci.yml runs.
set -e
make -C fastllama_tpu/native
python -m pytest tests/ -q
