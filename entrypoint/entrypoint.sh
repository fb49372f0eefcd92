#!/bin/bash
# Container entrypoint (reference entrypoint/entrypoint.sh): seed a default
# config when absent, then launch the scanner app.
set -e

CONFIG="${1:-/app/config.json}"

if [ ! -f "$CONFIG" ]; then
    python - "$CONFIG" <<'EOF'
import json, sys
from rtl_sdr_scanner_tpu.runtime.config import default_config_json
with open(sys.argv[1], "w") as f:
    json.dump(default_config_json(), f, indent=4, sort_keys=True)
EOF
fi

exec python -m rtl_sdr_scanner_tpu.runtime.main "$CONFIG"
