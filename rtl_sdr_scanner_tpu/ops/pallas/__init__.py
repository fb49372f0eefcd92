from rtl_sdr_scanner_tpu.ops.pallas import psd_kernel  # noqa: F401
