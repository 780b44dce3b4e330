"""TFRecord reading/writing via the native C++ library (ctypes).

Storage-layer equivalent of tf.data's TFRecordDataset used by the reference
(`/root/reference/src/dataloader.py:487-526`) with no TensorFlow
dependency: framing + CRC32C run in C++ (`native/tfrecord_io.cc`); a pure
Python fallback covers environments without a compiled library.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtfrecord_io.so")

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.tfr_scan.restype = ctypes.c_longlong
    lib.tfr_scan.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_longlong),
                             ctypes.POINTER(ctypes.c_longlong),
                             ctypes.c_longlong, ctypes.c_int]
    lib.tfr_read_at.restype = ctypes.c_int
    lib.tfr_read_at.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                                ctypes.c_longlong,
                                ctypes.POINTER(ctypes.c_uint8)]
    lib.tfr_writer_open.restype = ctypes.c_void_p
    lib.tfr_writer_open.argtypes = [ctypes.c_char_p]
    lib.tfr_writer_write.restype = ctypes.c_int
    lib.tfr_writer_write.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_uint8),
                                     ctypes.c_longlong]
    lib.tfr_writer_close.restype = ctypes.c_int
    lib.tfr_writer_close.argtypes = [ctypes.c_void_p]
    lib.tfr_crc32c.restype = ctypes.c_uint
    lib.tfr_crc32c.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong]
    _lib = lib
    return lib


# ---------------------------------------------------------------------------
# Pure-Python CRC32C fallback
# ---------------------------------------------------------------------------

_CRC_TABLE: Optional[List[int]] = None


def _crc_table() -> List[int]:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78
        table = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (poly ^ (c >> 1)) if (c & 1) else (c >> 1)
            table.append(c)
        _CRC_TABLE = table
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    lib = _load_lib()
    if lib is not None:
        buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
        return lib.tfr_crc32c(buf, len(data))
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


_MASK_DELTA = 0xA282EAD8


def _mask(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF


def _unmask(masked: int) -> int:
    rot = (masked - _MASK_DELTA) & 0xFFFFFFFF
    return ((rot >> 17) | (rot << 15)) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

class TFRecordWriter:
    """Write TFRecord files (native fast path; Python fallback)."""

    def __init__(self, path: str):
        self._path = path
        lib = _load_lib()
        self._lib = lib
        if lib is not None:
            self._handle = lib.tfr_writer_open(path.encode())
            if not self._handle:
                raise IOError(f"cannot open {path}")
            self._file = None
        else:
            self._handle = None
            self._file = open(path, "wb")

    def write(self, record: bytes) -> None:
        if self._handle is not None:
            buf = (ctypes.c_uint8 * len(record)).from_buffer_copy(record)
            if self._lib.tfr_writer_write(self._handle, buf, len(record)) != 0:
                raise IOError("tfrecord write failed")
        else:
            header = struct.pack("<Q", len(record))
            self._file.write(header)
            self._file.write(struct.pack("<I", _mask(crc32c(header))))
            self._file.write(record)
            self._file.write(struct.pack("<I", _mask(crc32c(record))))

    def close(self) -> None:
        if self._handle is not None:
            self._lib.tfr_writer_close(self._handle)
            self._handle = None
        elif self._file:
            self._file.close()
            self._file = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def scan_tfrecord(path: str, verify_crc: bool = False
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Return (offsets, lengths) of every record payload in the file."""
    lib = _load_lib()
    if lib is not None:
        cap = 1 << 20
        offsets = (ctypes.c_longlong * cap)()
        lengths = (ctypes.c_longlong * cap)()
        n = lib.tfr_scan(path.encode(), offsets, lengths, cap,
                         1 if verify_crc else 0)
        if n == -1:
            raise IOError(f"cannot open {path}")
        if n == -2:
            raise IOError(f"corrupt TFRecord: {path}")
        return (np.ctypeslib.as_array(offsets)[:n].copy(),
                np.ctypeslib.as_array(lengths)[:n].copy())
    offsets_l, lengths_l = [], []
    with open(path, "rb") as f:
        while True:
            header = f.read(12)
            if not header:
                break
            if len(header) != 12:
                raise IOError(f"corrupt TFRecord: {path}")
            (length,) = struct.unpack("<Q", header[:8])
            (len_crc,) = struct.unpack("<I", header[8:])
            if verify_crc and _unmask(len_crc) != crc32c(header[:8]):
                raise IOError(f"corrupt TFRecord header: {path}")
            offsets_l.append(f.tell())
            lengths_l.append(length)
            f.seek(length + 4, os.SEEK_CUR)
    return np.asarray(offsets_l, np.int64), np.asarray(lengths_l, np.int64)


def read_record(path: str, offset: int, length: int) -> bytes:
    lib = _load_lib()
    if lib is not None:
        out = (ctypes.c_uint8 * length)()
        if lib.tfr_read_at(path.encode(), offset, length, out) != 0:
            raise IOError(f"read failed: {path}@{offset}")
        return bytes(out)
    with open(path, "rb") as f:
        f.seek(offset)
        return f.read(length)


def iterate_tfrecord(path: str) -> Iterator[bytes]:
    """Sequential iteration over all records."""
    with open(path, "rb") as f:
        while True:
            header = f.read(12)
            if not header:
                return
            (length,) = struct.unpack("<Q", header[:8])
            data = f.read(length)
            f.read(4)  # data crc
            yield data


class TFRecordIndex:
    """Random-access index over a set of TFRecord shards."""

    def __init__(self, paths: Sequence[str], verify_crc: bool = False):
        self.paths = list(paths)
        self._entries: List[Tuple[int, int, int]] = []  # (file_idx, off, len)
        for fi, p in enumerate(self.paths):
            offs, lens = scan_tfrecord(p, verify_crc)
            for o, l in zip(offs.tolist(), lens.tolist()):
                self._entries.append((fi, o, l))

    def __len__(self) -> int:
        return len(self._entries)

    def __getitem__(self, i: int) -> bytes:
        fi, off, ln = self._entries[i]
        return read_record(self.paths[fi], off, ln)
