"""Golden tests for utils.radio_utils.

Expectations mirror the reference's gtest suite tests/test_radio_utils.cpp —
the behavioral contract the new framework must keep.
"""

from rtl_sdr_scanner_tpu.utils.radio_utils import (
    get_fft,
    get_prime_factors,
    get_range_split_sample_rate,
    get_resamplers_factors,
    get_tuned_frequency,
    split_range,
)


def test_fft():
    assert get_fft(2048000 - 1, 1000) == 2048
    assert get_fft(2048000, 1000) == 2048
    assert get_fft(2048000 + 1, 1000) == 4096

    assert get_fft(20480000 - 1, 625) == 32768
    assert get_fft(20480000, 625) == 32768
    assert get_fft(20480000 + 1, 625) == 65536

    assert get_fft(104857600 - 1, 100) == 1048576
    assert get_fft(104857600, 100) == 1048576
    assert get_fft(104857600 + 1, 100) == 2097152


def test_prime_factors():
    assert get_prime_factors(1) == [1]
    assert get_prime_factors(2) == [2]
    assert get_prime_factors(3) == [3]
    assert get_prime_factors(4) == [2, 2]
    assert get_prime_factors(89) == [89]
    assert get_prime_factors(1250) == [2, 5, 5, 5, 5]
    assert get_prime_factors(1200500) == [2, 2, 5, 5, 5, 7, 7, 7, 7]


def test_resamplers_random():
    threshold = 125
    assert get_resamplers_factors(1, 1, threshold) == [(1, 1)]
    assert get_resamplers_factors(7823, 7823, threshold) == [(1, 1)]
    assert get_resamplers_factors(7823, 7883, threshold) == [(7883, 7823)]


def test_resamplers_typical_16khz():
    threshold = 125
    assert get_resamplers_factors(1000000, 16000, threshold) == [(2, 125)]
    assert get_resamplers_factors(10000000, 16000, threshold) == [(1, 25), (1, 25)]
    assert get_resamplers_factors(1024000, 16000, threshold) == [(1, 64)]
    assert get_resamplers_factors(10240000, 16000, threshold) == [(1, 20), (1, 32)]
    assert get_resamplers_factors(2000000, 16000, threshold) == [(1, 125)]
    assert get_resamplers_factors(20000000, 16000, threshold) == [(1, 25), (1, 50)]
    assert get_resamplers_factors(2048000, 16000, threshold) == [(1, 8), (1, 16)]
    assert get_resamplers_factors(20480000, 16000, threshold) == [(1, 32), (1, 40)]


def test_resamplers_typical_20khz():
    threshold = 125
    assert get_resamplers_factors(1000000, 20000, threshold) == [(1, 50)]
    assert get_resamplers_factors(10000000, 20000, threshold) == [(1, 20), (1, 25)]
    assert get_resamplers_factors(1024000, 20000, threshold) == [(1, 16), (5, 16)]
    assert get_resamplers_factors(10240000, 20000, threshold) == [(1, 16), (1, 32)]
    assert get_resamplers_factors(2000000, 20000, threshold) == [(1, 100)]
    assert get_resamplers_factors(20000000, 20000, threshold) == [(1, 25), (1, 40)]
    assert get_resamplers_factors(2048000, 20000, threshold) == [(1, 16), (5, 32)]
    assert get_resamplers_factors(20480000, 20000, threshold) == [(1, 32), (1, 32)]


def test_tuned_frequency():
    assert get_tuned_frequency(-999, 1000) == -1000
    assert get_tuned_frequency(-1001, 1000) == -1000
    assert get_tuned_frequency(-1499, 1000) == -1000
    assert get_tuned_frequency(-1500, 1000) == -1000
    assert get_tuned_frequency(-1501, 1000) == -2000

    assert get_tuned_frequency(999, 1000) == 1000
    assert get_tuned_frequency(1001, 1000) == 1000
    assert get_tuned_frequency(1499, 1000) == 1000
    assert get_tuned_frequency(1500, 1000) == 2000
    assert get_tuned_frequency(1501, 1000) == 2000

    assert get_tuned_frequency(499, 500) == 500
    assert get_tuned_frequency(500, 500) == 500
    assert get_tuned_frequency(501, 500) == 500
    assert get_tuned_frequency(749, 500) == 500
    assert get_tuned_frequency(750, 500) == 1000
    assert get_tuned_frequency(751, 500) == 1000
    assert get_tuned_frequency(999, 500) == 1000
    assert get_tuned_frequency(1000, 500) == 1000
    assert get_tuned_frequency(1001, 500) == 1000
    assert get_tuned_frequency(1249, 500) == 1000
    assert get_tuned_frequency(1250, 500) == 1500
    assert get_tuned_frequency(1251, 500) == 1500


def test_range_split_sample_rate():
    assert get_range_split_sample_rate(81920000) == 81000000
    assert get_range_split_sample_rate(80000000) == 80000000
    assert get_range_split_sample_rate(40960000) == 40000000
    assert get_range_split_sample_rate(20480000) == 20000000
    assert get_range_split_sample_rate(10240000) == 10000000
    assert get_range_split_sample_rate(3200000) == 3000000
    assert get_range_split_sample_rate(2880000) == 2500000
    assert get_range_split_sample_rate(2560000) == 2500000
    assert get_range_split_sample_rate(2160000) == 2000000
    assert get_range_split_sample_rate(2048000) == 2000000
    assert get_range_split_sample_rate(1920000) == 1500000
    assert get_range_split_sample_rate(1720000) == 1500000
    assert get_range_split_sample_rate(1024000) == 1000000
    assert get_range_split_sample_rate(250000) == 200000


def test_split_ranges():
    assert split_range((140000000, 160000000), 20000000) == [(140000000, 160000000)]
    assert split_range((140000000, 180000000), 20000000) == [
        (140000000, 160000000),
        (160000000, 180000000),
    ]
    assert split_range((140000000, 145000000), 2000000) == [
        (140000000, 142000000),
        (142000000, 144000000),
        (144000000, 146000000),
    ]
    assert split_range((140000000, 150000000), 2000000) == [
        (140000000, 142000000),
        (142000000, 144000000),
        (144000000, 146000000),
        (146000000, 148000000),
        (148000000, 150000000),
    ]
