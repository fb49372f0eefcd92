# Packaging parity with the reference's multi-stage Docker build
# (reference Dockerfile builds GNU Radio/SoapySDR stacks; the TPU build just
# needs python + jax and optionally SoapySDR python bindings for hardware).
FROM python:3.12-slim AS base

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY rtl_sdr_scanner_tpu ./rtl_sdr_scanner_tpu
COPY entrypoint ./entrypoint
COPY scripts ./scripts

# CPU jax by default; swap for the TPU wheel on TPU VMs
RUN pip install --no-cache-dir "jax[cpu]" numpy paho-mqtt && \
    pip install --no-cache-dir .

FROM base AS test
COPY tests ./tests
RUN pip install --no-cache-dir pytest && python -m pytest tests/ -q

FROM base AS release
ENTRYPOINT ["/app/entrypoint/entrypoint.sh"]
CMD ["/app/config.json"]
