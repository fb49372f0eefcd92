from rtl_sdr_scanner_tpu.ops import (  # noqa: F401
    averager,
    ddc,
    noise,
    psd,
    quantize,
    smooth,
    spectrogram,
    window,
)
