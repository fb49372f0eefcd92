"""Native SPSC ingest ring (native/ring.cpp via ctypes).

Covers wrap-around, overflow-drop accounting, and a threaded
producer/consumer stream integrity check (the live-source usage pattern:
runtime/sources.py SoapySource.start_streaming).
"""

import threading

import numpy as np

from rtl_sdr_scanner_tpu.native import IngestRing, native_available


def test_ring_basic_wraparound():
    ring = IngestRing(256)  # rounds up to a power of two
    cap = ring.capacity
    assert cap >= 256
    # fill / drain repeatedly so head/tail wrap several times
    seq = np.arange(cap * 5, dtype=np.uint8)
    pos = 0
    out = []
    while pos < seq.size:
        n = min(37, seq.size - pos)
        wrote = ring.write(seq[pos : pos + n])
        assert wrote == n  # reads below keep the ring under capacity
        pos += n
        out.append(ring.read(37))
    while True:
        chunk = ring.read(64)
        if chunk.size == 0:
            break
        out.append(chunk)
    got = np.concatenate(out).view(np.uint8)
    np.testing.assert_array_equal(got, seq)
    assert ring.dropped_bytes == 0


def test_ring_overflow_drops_and_counts():
    ring = IngestRing(128)
    cap = ring.capacity
    data = np.zeros(cap + 50, dtype=np.uint8)
    wrote = ring.write(data)
    assert wrote == cap
    assert ring.dropped_bytes == 50
    assert ring.available == cap
    # consumer frees space; writes resume
    _ = ring.read(64)
    assert ring.write(np.zeros(10, dtype=np.uint8)) == 10


def test_ring_threaded_stream_integrity():
    """Concurrent producer/consumer: the full stream must arrive exactly
    once, in order (producer resumes after partial writes when the ring is
    momentarily full)."""
    ring = IngestRing(1 << 14)
    total = 1 << 20
    src = np.arange(total // 4, dtype=np.uint32).view(np.uint8)

    def producer():
        pos = 0
        while pos < src.size:
            n = min(4096, src.size - pos)
            wrote = ring.write(src[pos : pos + n])
            pos += wrote

    out = []
    t = threading.Thread(target=producer)
    t.start()
    while t.is_alive() or ring.available:
        chunk = ring.read(8192)
        if chunk.size:
            out.append(chunk)
    t.join()

    got = np.concatenate(out).view(np.uint8)
    np.testing.assert_array_equal(got, src)
    # note: dropped_bytes counts offered-but-not-stored bytes; a retrying
    # producer recounts its retried tails, so no drop assertion here


def test_native_library_builds():
    # the ring test passes with the numpy fallback too; record which path ran
    assert isinstance(native_available(), bool)
