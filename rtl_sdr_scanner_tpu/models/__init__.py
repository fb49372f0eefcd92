from rtl_sdr_scanner_tpu.models import ddc_pipeline, scan_pipeline  # noqa: F401
