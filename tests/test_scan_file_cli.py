"""scan_file.py CLI contract: single-band and wideband offline scans."""

import json
import os
import subprocess
import sys

import numpy as np

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts", "scan_file.py")
RATE = 256000


def _capture(tmp_path):
    rng = np.random.default_rng(2)
    secs = 8.0
    n = int(RATE * secs)
    t = np.arange(n) / RATE
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    audio = np.sin(2 * np.pi * 800 * t)
    phase = 2 * np.pi * 30000 * t + 2 * np.pi * 3000 * np.cumsum(audio) / RATE
    iq += 0.4 * np.exp(1j * phase) * ((t >= 3.0) & (t < 6.0))
    path = tmp_path / "cli.cf32"
    iq.astype(np.complex64).view(np.float32).tofile(path)
    return path


def test_scan_file_json_and_recordings(tmp_path):
    capture = _capture(tmp_path)
    out_dir = tmp_path / "rec"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    result = subprocess.run(
        [
            sys.executable,
            SCRIPT,
            "--file", str(capture),
            "--rate", str(RATE),
            "--center", "145e6",
            "--min-time-ms", "1000",
            "--max-noise-time-ms", "1000",
            "--out-dir", str(out_dir),
            "--json",
            "--cpu",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    summary = json.loads(result.stdout.strip().splitlines()[-1])
    assert summary["transmissions"], summary
    tx = summary["transmissions"][0]
    assert abs(tx["frequency"] - 145_030_000) <= 2500
    assert tx["seconds"] > 2.0
    assert os.path.exists(tx["file"])
    # recording file round-trips as cs8 IQ pairs
    rec = np.fromfile(tx["file"], dtype=np.int8)
    assert rec.size == tx["samples"] * 2
