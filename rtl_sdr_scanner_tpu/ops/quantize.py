"""IQ sample quantization (device side).

Replaces gr::blocks::complex_to_interleaved_char(scale=127) in the recorder
chain (sources/radio/recorder.cpp:36): complex float -> interleaved int8 with
round + saturate. The wire-format XOR 0x80 (offset binary) stays in the host
codec (runtime/data_controller.py), as in the reference
(network/data_controller.cpp:38-40).
"""

from __future__ import annotations

import jax.numpy as jnp


def complex_to_interleaved_int8(x: jnp.ndarray, scale: float = 127.0) -> jnp.ndarray:
    """[..., n] complex64 -> [..., n, 2] int8 (I then Q), rounded + saturated."""
    stacked = jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1) * scale
    return jnp.clip(jnp.round(stacked), -128, 127).astype(jnp.int8)
