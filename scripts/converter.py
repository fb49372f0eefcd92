#!/usr/bin/env python3
"""Offline raw-IQ / power-dump analysis tool.

Counterpart of the reference's scripts/converter.py: renders debug raw dumps
(written by the FileSink debug taps, filename convention from
utils/radio_utils.get_raw_file_name) as jet-colormap spectrogram images, and
converts captures to gqrx format. Reads cs8 / cu8 / cf32 IQ and s8 / u8 / f32
power dumps.

Usage:
  converter.py --spectrogram [-f FFT] file.raw ...
  converter.py --spectrogram --power file.raw ...   # file holds PSD rows
  converter.py --gqrx file ...
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np


def format_frequency(frequency: int) -> str:
    f1 = frequency // 1000000
    f2 = (frequency // 1000) % 1000
    f3 = frequency % 1000
    return "%3d.%03d.%03d Hz" % (f1, f2, f3)


def file_info(path: str):
    d = os.path.dirname(path)
    name, ext = os.path.splitext(os.path.basename(path))
    return d or ".", name, ext[1:]


def _load(path: str, dtype) -> np.ndarray:
    """Memory-map a dump file without copying it into RAM (captures can be
    gigabytes); callers convert lazily per row batch."""
    return np.memmap(path, dtype=dtype, mode="r")


def _fit_rows(data: np.ndarray, fit: int) -> np.ndarray:
    if data.size % fit != 0:
        data = data[: -(data.size % fit)]
    return np.asarray(data).reshape(-1, fit)


def read_raw_iq(path: str, fit: int) -> np.ndarray:
    _, name, ext = file_info(path)
    if ext == "cs8" or name.endswith("cs8") or "_cs8" in name:
        data = _load(path, np.int8).astype(np.complex64) / 127.5
    elif ext == "cu8" or name.endswith("cu8"):
        raw = _load(path, np.uint8).astype(np.float32)
        data = ((raw - 127.5) / 127.5).astype(np.complex64)
    else:
        data = _load(path, np.complex64)
    return _fit_rows(data, fit)


def read_power(path: str, fit: int) -> np.ndarray:
    _, name, ext = file_info(path)
    if ext == "s8" or name.endswith("s8"):
        data = _load(path, np.int8).astype(np.float32)
    elif ext == "u8" or name.endswith("u8"):
        data = _load(path, np.uint8).astype(np.float32)
    else:
        data = _load(path, np.float32)
    return _fit_rows(data, fit)


def psd_rows(iq_rows: np.ndarray, sample_rate: int) -> np.ndarray:
    spec = np.fft.fft(iq_rows, axis=-1)
    power = np.abs(spec) ** 2 / np.float32(sample_rate)
    return np.fft.fftshift(10.0 * np.log10(np.maximum(power, 1e-30)), axes=(1,))


def parse_name_fields(path: str):
    """Filename convention: label_date_time_frequency_samplerate_ext.raw."""
    parts = re.split(r"[._]", os.path.basename(path))
    try:
        return int(parts[3]), int(parts[4])
    except (IndexError, ValueError):
        return 0, 0


def spectrogram(path: str, fft: int, power: bool) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d, name, ext = file_info(path)
    frequency, sample_rate = parse_name_fields(path)
    data = read_power(path, fft) if power else psd_rows(read_raw_iq(path, fft), sample_rate or 1)
    print(
        f"rendering {name}.{ext}: {data.shape[0]} rows of fft {fft} "
        f"@ {format_frequency(frequency)} ({sample_rate} sps)"
    )
    norm = plt.Normalize(vmin=float(data.min()), vmax=float(data.max()))
    image = plt.cm.jet(norm(data))
    plt.imsave(os.path.join(d, name + ".jpg"), image)


def gqrx(path: str) -> None:
    d, name, ext = file_info(path)
    if ext == "raw":
        return
    data = read_raw_iq(path, 1).ravel()
    print(f"gqrx export {name}.{ext}: {data.size} samples")
    with open(os.path.join(d, name + ".raw"), "wb") as f:
        np.save(f, data)


def main() -> int:
    parser = argparse.ArgumentParser(description="Raw IQ data converter")
    parser.add_argument("-f", "--fft", type=int, default=2048)
    parser.add_argument("--spectrogram", action="store_true")
    parser.add_argument("--gqrx", action="store_true")
    parser.add_argument("--power", action="store_true")
    parser.add_argument("file", type=str, nargs="+")
    args = parser.parse_args()

    if args.spectrogram:
        for f in args.file:
            spectrogram(f, args.fft, args.power)
    if args.gqrx:
        for f in args.file:
            gqrx(f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
