from rtl_sdr_scanner_tpu.ops import (  # noqa: F401
    averager,
    channelizer,
    ddc,
    detect,
    noise,
    psd,
    quantize,
    smooth,
    spectrogram,
    window,
)
