"""Mesh scaling structure guard (round-2 verdict item 9).

"Near-linear by construction" rests on two structural facts that must not
regress: (1) the per-block dispatch count is CONSTANT in the mesh size (one
sharded channelize+scan program, plus one banded DDC program only while
recording -- never B per-band dispatches), and (2) each device owns exactly
B/N bands. Wall-clock scaling cannot be asserted on a virtual CPU mesh, so
this pins the structure instead.
"""

import json

import numpy as np
import pytest

from rtl_sdr_scanner_tpu.runtime.config import Config, default_config_json
from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt
from rtl_sdr_scanner_tpu.runtime.wideband import WidebandScanner

RATE = 1_024_000
B = 8
CENTER = 145_000_000


def _capture(tmp_path):
    rng = np.random.default_rng(17)
    secs = 5.0
    n = int(RATE * secs)
    t = np.arange(n) / RATE
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    audio = np.sin(2 * np.pi * 900 * t)
    phase = 2 * np.pi * 300_000 * t + 2 * np.pi * 3000 * np.cumsum(audio) / RATE
    iq += 0.4 * np.exp(1j * phase) * ((t >= 2.5) & (t < 4.5))
    path = tmp_path / "scale.cf32"
    iq.astype(np.complex64).view(np.float32).tofile(path)
    return path


@pytest.mark.parametrize("mesh_bands", [1, 2, 4, 8])
def test_dispatch_count_constant_in_mesh_size(tmp_path, mesh_bands):
    capture = _capture(tmp_path)
    raw = default_config_json()
    raw["tunables"] = {"mesh_bands": mesh_bands}
    raw["recording"] = {
        "max_noise_time_ms": 1000,
        "min_sample_rate": 16000,
        "min_time_ms": 500,
        "step": 2500,
    }
    raw["devices"] = [
        {
            "enabled": True,
            "serial": "scale",
            "driver": "replay",
            "sample_rate": RATE,
            "start_recording_level": 8,
            "stop_recording_level": 5,
            "gains": [],
            "ranges": [{"start": CENTER - RATE // 2, "stop": CENTER + RATE // 2}],
            "file": str(capture),
            "file_format": "cf32",
            "channels": B,
        }
    ]
    p = tmp_path / f"cfg_scale_{mesh_bands}.json"
    p.write_text(json.dumps(raw))
    cfg = Config.load_from_file(str(p), scan_hardware=False)
    mqtt = NullMqtt()
    scanner = WidebandScanner(cfg, cfg.devices[0], mqtt, recorders_count=8)
    assert scanner._mesh is not None
    assert scanner._mesh.devices.size == mesh_bands
    # each device owns exactly B/N bands of every sharded leaf
    shards = scanner._band_state.noise.threshold.sharding.shard_shape(
        scanner._band_state.noise.threshold.shape
    )
    assert shards[0] == B // mesh_bands

    wide_calls = [0]
    ddc_calls = [0]
    orig_wide, orig_ddc = scanner._wide_step, scanner._ddc_band_step
    assert orig_ddc is not None

    def wide(*a):
        wide_calls[0] += 1
        return orig_wide(*a)

    def ddc(*a):
        ddc_calls[0] += 1
        return orig_ddc(*a)

    scanner._wide_step, scanner._ddc_band_step = wide, ddc

    blocks = 0
    while scanner.step():
        blocks += 1
    assert blocks > 0
    # ONE sharded scan dispatch per block -- independent of B and mesh size
    assert wide_calls[0] == blocks, (wide_calls[0], blocks)
    # recording ran, as ONE banded dispatch per recording block (never B)
    assert 0 < ddc_calls[0] <= blocks, (ddc_calls[0], blocks)
