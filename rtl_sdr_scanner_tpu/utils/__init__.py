from rtl_sdr_scanner_tpu.utils import collection_utils, radio_utils, utils  # noqa: F401
