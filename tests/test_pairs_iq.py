"""f32 (re, im)-pairs IQ must match the complex64 path bit-for-bit.

complex64 never crosses the host<->device boundary (runtime/sdr_device.py
submit_block, runtime/wideband.py): cf32 captures are uploaded as their free
f32 pair view and recombined in-jit. These tests pin the pairs layout to the
complex layout through the scan pipeline, the DDC, and the channelizer.
"""

import jax.numpy as jnp
import numpy as np

from rtl_sdr_scanner_tpu.models.scan_pipeline import ScanConfig, init_scan_state, make_scan_step
from rtl_sdr_scanner_tpu.ops.channelizer import (
    channelize_block,
    channelize_block_pairs,
    init_channelizer_state,
    plan_channelizer,
)
from rtl_sdr_scanner_tpu.ops.ddc import ddc_chunk, init_ddc_state, make_nco_tables, plan_chain

RNG = np.random.default_rng(21)


def _pairs(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x, dtype=np.complex64).view(np.float32).reshape(*x.shape, 2)


def test_scan_pipeline_pairs_equals_complex():
    cfg = ScanConfig.create(256000, frames_per_block=4)
    group = cfg.fft_size * cfg.decimator_factor
    iq = (RNG.standard_normal((4, group)) + 1j * RNG.standard_normal((4, group))).astype(
        np.complex64
    )
    now = ((1 + np.arange(4)) * cfg.frame_interval_ms).astype(np.int32)
    step = make_scan_step(cfg)

    s1, o1 = step(init_scan_state(cfg), jnp.asarray(iq), jnp.asarray(now))
    s2, o2 = step(init_scan_state(cfg), jnp.asarray(_pairs(iq)), jnp.asarray(now))
    np.testing.assert_array_equal(np.asarray(o1.raw), np.asarray(o2.raw))
    np.testing.assert_array_equal(np.asarray(o1.avg), np.asarray(o2.avg))
    np.testing.assert_array_equal(
        np.asarray(s1.noise.threshold), np.asarray(s2.noise.threshold)
    )


def test_ddc_pairs_equals_complex():
    plans = plan_chain(1024000, 16000)
    chunk = 4096 * 4
    iq = (RNG.standard_normal(chunk) + 1j * RNG.standard_normal(chunk)).astype(np.complex64)
    tables = make_nco_tables(np.array([120000, -50000]), 1024000, chunk)

    st1, out1 = ddc_chunk(jnp.asarray(iq), init_ddc_state(plans, 2), tables, plans)
    st2, out2 = ddc_chunk(jnp.asarray(_pairs(iq)), init_ddc_state(plans, 2), tables, plans)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(st1.phase), np.asarray(st2.phase))


def test_channelizer_pairs_equals_complex():
    plan = plan_channelizer(8)
    n = 8 * 1024
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(np.complex64)

    st1, ch1 = channelize_block(plan, init_channelizer_state(plan), jnp.asarray(x))
    st2, ch2 = channelize_block_pairs(
        plan, init_channelizer_state(plan), jnp.asarray(_pairs(x))
    )
    ref = np.stack([np.real(np.asarray(ch1)), np.imag(np.asarray(ch1))], axis=-1)
    np.testing.assert_array_equal(ref, np.asarray(ch2))
