"""Golden tests for utils.utils (mirrors reference tests/test_utils.cpp)."""

import numpy as np

from rtl_sdr_scanner_tpu.utils.utils import round_down, round_up, sliding_average


def test_sliding_average():
    data = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9], dtype=np.float32)
    expected = np.array([2, 2.5, 3, 4, 5, 6, 7, 7.5, 8], dtype=np.float32)
    np.testing.assert_allclose(sliding_average(data, 5), expected, rtol=1e-6)


def test_sliding_average_batched():
    data = np.arange(1, 19, dtype=np.float32).reshape(2, 9)
    out = sliding_average(data, 5)
    np.testing.assert_allclose(out[0], sliding_average(data[0], 5))
    np.testing.assert_allclose(out[1], sliding_average(data[1], 5))


def test_round_up():
    assert round_up(19999999, 1000000) == 20000000
    assert round_up(20000000, 1000000) == 20000000
    assert round_up(20000001, 1000000) == 21000000


def test_round_down():
    assert round_down(19999999, 1000000) == 19000000
    assert round_down(20000000, 1000000) == 20000000
    assert round_down(20000001, 1000000) == 20000000
