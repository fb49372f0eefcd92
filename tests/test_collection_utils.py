"""Golden tests for utils.collection_utils (mirrors reference
tests/test_collection_utils.cpp expectations)."""

import numpy as np

from rtl_sdr_scanner_tpu.utils.collection_utils import (
    contains_with_margin,
    get_max_index,
    get_nearest_element,
    most_frequent_value,
)


def test_contains_with_margin_0():
    keys = [10, 14]
    assert contains_with_margin(keys, 9, 0) is None
    assert contains_with_margin(keys, 10, 0) == 10
    assert contains_with_margin(keys, 11, 0) is None
    assert contains_with_margin(keys, 13, 0) is None
    assert contains_with_margin(keys, 14, 0) == 14
    assert contains_with_margin(keys, 15, 0) is None


def test_contains_with_margin_1():
    keys = [10, 14]
    assert contains_with_margin(keys, 8, 1) is None
    assert contains_with_margin(keys, 9, 1) == 10
    assert contains_with_margin(keys, 10, 1) == 10
    assert contains_with_margin(keys, 11, 1) == 10
    assert contains_with_margin(keys, 12, 1) is None
    assert contains_with_margin(keys, 13, 1) == 14
    assert contains_with_margin(keys, 14, 1) == 14
    assert contains_with_margin(keys, 15, 1) == 14
    assert contains_with_margin(keys, 16, 1) is None


def test_contains_with_margin_2():
    keys = [10, 14]
    assert contains_with_margin(keys, 8, 2) is None
    assert contains_with_margin(keys, 9, 2) == 10
    assert contains_with_margin(keys, 11, 2) == 10
    assert contains_with_margin(keys, 12, 2) is None
    assert contains_with_margin(keys, 13, 2) == 14
    assert contains_with_margin(keys, 15, 2) == 14
    assert contains_with_margin(keys, 16, 2) is None


def test_most_frequent_value():
    assert most_frequent_value([1, 2, 3, 4, 5, 5]) == 5
    assert most_frequent_value([3, 3, 1, 1, 5, 5]) == 3
    assert most_frequent_value([3, 3, 1, 1, 5, 5, 2, 2]) == 3
    assert most_frequent_value([1, 1, 1, 1, 2, 5, 5, 5]) == 1
    assert (
        most_frequent_value(
            [1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10]
        )
        == 1
    )


def test_nearest_element():
    data = [10, 20, 30, 40]
    assert get_nearest_element(data, 9) == 10
    assert get_nearest_element(data, 10) == 10
    assert get_nearest_element(data, 11) == 10
    assert get_nearest_element(data, 24) == 20
    assert get_nearest_element(data, 25) == 30
    assert get_nearest_element(data, 26) == 30
    assert get_nearest_element(data, 39) == 40
    assert get_nearest_element(data, 40) == 40
    assert get_nearest_element(data, 41) == 40


def test_get_max_index():
    data = np.array([1, 2, 3, 4, 5, 4, 3, 2, 1], dtype=np.float32)
    assert get_max_index(data, 0, 0) == 0
    assert get_max_index(data, 0, 1) == 0
    assert get_max_index(data, 0, 2) == 1
    assert get_max_index(data, 0, 3) == 1
    assert get_max_index(data, 8, 0) == 8
    assert get_max_index(data, 8, 1) == 8
    assert get_max_index(data, 8, 2) == 7
    assert get_max_index(data, 8, 3) == 7
    assert get_max_index(data, 8, 4) == 6
    assert get_max_index(data, 8, 5) == 6
