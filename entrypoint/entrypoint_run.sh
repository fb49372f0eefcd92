#!/bin/bash
# Runtime entrypoint with vendor daemon support (reference
# entrypoint/entrypoint_run.sh:3-9): SDRplay front-ends need their userspace
# API service running before SoapySDR can enumerate them. The daemon is an
# optional vendor install on the host image; absent it, this is entrypoint.sh.
set -e

CONFIG="${1:-/app/config.json}"

if command -v sdrplay_apiService >/dev/null 2>&1; then
    sdrplay_apiService &
fi

exec /app/entrypoint/entrypoint.sh "$CONFIG"
