"""TFRecord-compatible IO, TensorFlow-free.

Reads/writes the reference's exact on-disk format
(datasets/preprocessing.py:197-271): TFRecord framing (length + masked
CRC32C) around ``tf.train.Example`` protos with two features — ``array``
(packed float list) and ``shape`` (packed int64 list) — so datasets produced
by either codebase interoperate.

CRC32C comes from the repo's native C++ library (``native/libasr_native.so``,
built on first use) with a pure-python fallback; proto encode/decode is
hand-rolled (the schema is two fixed fields) and the float payload moves as
a single numpy buffer.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Iterable, Iterator, List, Sequence, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# CRC32C (native with python fallback)
# ---------------------------------------------------------------------------

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_native = None


def _load_native():
    global _native
    if _native is not None:
        return _native
    so = os.path.join(_NATIVE_DIR, "libasr_native.so")
    if not os.path.exists(so):
        src = os.path.join(_NATIVE_DIR, "asr_native.cpp")
        if os.path.exists(src):
            try:
                subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                               check=True, capture_output=True)
            except Exception:
                _native = False
                return _native
    if os.path.exists(so):
        try:
            lib = ctypes.CDLL(so)
            lib.asr_masked_crc32c.restype = ctypes.c_uint32
            lib.asr_masked_crc32c.argtypes = [ctypes.c_char_p,
                                              ctypes.c_size_t]
            _native = lib
            return _native
        except OSError:
            pass
    _native = False
    return _native


_CRC_TABLE = None


def _crc_table():
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78
        table = np.zeros(256, np.uint32)
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ (poly if crc & 1 else 0)
            table[i] = crc
        _CRC_TABLE = table
    return _CRC_TABLE


def _crc32c_py(data: bytes) -> int:
    table = _crc_table()
    crc = np.uint32(0xFFFFFFFF)
    for b in memoryview(data):
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> np.uint32(8))
    return int(crc ^ np.uint32(0xFFFFFFFF))


def masked_crc32c(data: bytes) -> int:
    lib = _load_native()
    if lib:
        return lib.asr_masked_crc32c(data, len(data))
    crc = _crc32c_py(data)
    return ((crc >> 15) | (crc << 17) & 0xFFFFFFFF) + 0xA282EAD8 & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# minimal tf.train.Example proto (array: float_list, shape: int64_list)
# ---------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: memoryview, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _len_delim(tag: int, payload: bytes) -> bytes:
    return bytes([tag]) + _varint(len(payload)) + payload


def serialize_example(array: np.ndarray) -> bytes:
    """tf.train.Example bytes with the reference's 'array'+'shape' schema
    (preprocessing.py:197-217)."""
    array = np.asarray(array, np.float32)
    float_payload = array.reshape(-1).astype("<f4").tobytes()
    float_list = _len_delim(0x0A, float_payload)         # FloatList.value
    feature_array = _len_delim(0x12, float_list)         # Feature.float_list

    shape_payload = b"".join(_varint(int(d)) for d in array.shape)
    int64_list = _len_delim(0x0A, shape_payload)         # Int64List.value
    feature_shape = _len_delim(0x1A, int64_list)         # Feature.int64_list

    def map_entry(key: bytes, feature: bytes) -> bytes:
        body = _len_delim(0x0A, key) + _len_delim(0x12, feature)
        return _len_delim(0x0A, body)                    # Features.feature

    features = map_entry(b"array", feature_array) + map_entry(
        b"shape", feature_shape)
    return _len_delim(0x0A, features)                    # Example.features


def parse_example(data: bytes) -> np.ndarray:
    """Parse an Example with the 'array'+'shape' schema back to an ndarray."""
    buf = memoryview(data)

    def walk_message(view) -> dict:
        fields = {}
        pos = 0
        while pos < len(view):
            key, pos = _read_varint(view, pos)
            field, wire = key >> 3, key & 7
            if wire == 2:
                ln, pos = _read_varint(view, pos)
                fields.setdefault(field, []).append(view[pos:pos + ln])
                pos += ln
            elif wire == 0:
                val, pos = _read_varint(view, pos)
                fields.setdefault(field, []).append(val)
            elif wire == 5:
                fields.setdefault(field, []).append(view[pos:pos + 4])
                pos += 4
            elif wire == 1:
                fields.setdefault(field, []).append(view[pos:pos + 8])
                pos += 8
            else:
                raise ValueError(f"unsupported wire type {wire}")
        return fields

    example = walk_message(buf)
    features = walk_message(example[1][0])
    array = None
    shape = None
    for entry in features.get(1, []):
        kv = walk_message(entry)
        key = bytes(kv[1][0]).decode()
        feature = walk_message(kv[2][0])
        if key == "array":
            float_list = walk_message(feature[2][0])
            payload = float_list.get(1, [b""])[0]
            array = np.frombuffer(bytes(payload), "<f4")
        elif key == "shape":
            int64_list = walk_message(feature[3][0])
            raw = int64_list.get(1, [b""])[0]
            dims = []
            pos = 0
            view = memoryview(raw) if not isinstance(raw, int) else None
            if view is not None:
                while pos < len(view):
                    d, pos = _read_varint(view, pos)
                    dims.append(d)
            else:
                dims = [raw]
            shape = dims
    if array is None:
        raise ValueError("Example missing 'array' feature")
    return array.reshape(shape) if shape else array


# ---------------------------------------------------------------------------
# record framing
# ---------------------------------------------------------------------------

def write_records(path: str, payloads: Iterable[bytes]) -> int:
    """Write raw payloads with TFRecord framing; returns record count."""
    n = 0
    with open(path, "wb") as f:
        for payload in payloads:
            header = struct.pack("<Q", len(payload))
            f.write(header)
            f.write(struct.pack("<I", masked_crc32c(header)))
            f.write(payload)
            f.write(struct.pack("<I", masked_crc32c(payload)))
            n += 1
    return n


def read_records(path: str, verify_crc: bool = True) -> Iterator[bytes]:
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    n = len(data)
    while pos + 12 <= n:
        (length,) = struct.unpack_from("<Q", data, pos)
        (len_crc,) = struct.unpack_from("<I", data, pos + 8)
        if verify_crc and masked_crc32c(data[pos:pos + 8]) != len_crc:
            raise ValueError(f"{path}: corrupt length CRC at offset {pos}")
        start = pos + 12
        payload = data[start:start + length]
        (data_crc,) = struct.unpack_from("<I", data, start + length)
        if verify_crc and masked_crc32c(payload) != data_crc:
            raise ValueError(f"{path}: corrupt data CRC at offset {start}")
        yield payload
        pos = start + length + 4


# ---------------------------------------------------------------------------
# array-level API (the reference's save/load_tf_records contract)
# ---------------------------------------------------------------------------

def save_tf_records(arrays: Iterable[np.ndarray], filename: str) -> int:
    """Save arrays to one .tfrecord file (preprocessing.py:228-244)."""
    if not filename.endswith(".tfrecord"):
        filename += ".tfrecord"
    return write_records(filename,
                         (serialize_example(a) for a in arrays))


def load_tf_records(filenames: Sequence[str]) -> List[np.ndarray]:
    """Load arrays from .tfrecord files (preprocessing.py:247-271)."""
    if isinstance(filenames, (str, os.PathLike)):
        filenames = [filenames]
    out: List[np.ndarray] = []
    for fn in filenames:
        out.extend(parse_example(p) for p in read_records(fn))
    return out
