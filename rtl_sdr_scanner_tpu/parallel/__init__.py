from rtl_sdr_scanner_tpu.parallel import halo, mesh, sharded_scan  # noqa: F401
