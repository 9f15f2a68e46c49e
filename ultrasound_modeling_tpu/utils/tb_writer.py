"""Minimal TensorBoard event writer — no TensorFlow dependency.

The reference logs scalars/images via ``tf.summary.create_file_writer``
(reference: MainNumpy.py:16-17,124-133, TBIPixelCNN.py:253-254).  This module
writes TensorBoard-compatible ``events.out.tfevents.*`` files directly:
hand-encoded Event protobufs in TFRecord framing (length + masked CRC32C),
which is all TensorBoard's loader requires.

Wire format (protobuf, proto3):
  Event    { 1: wall_time (double); 2: step (int64); 5: summary (Summary) }
  Summary  { 1: repeated Value }
  Value    { 1: tag (string); 2: simple_value (float); 4: image (Image) }
  Image    { 1: height; 2: width; 3: colorspace; 4: encoded_image_string }
TFRecord  = u64le(len) + masked_crc(len_bytes) + payload + masked_crc(payload)
masked_crc(x) = rotr15(crc32c(x)) + 0xa282ead8  (mod 2^32)

Image events carry a PNG (hand-encoded too — zlib + filter-0 scanlines; no
PIL/matplotlib dependency), giving TensorBoard the pred/truth panel timeline
the reference logs with ``tf.summary.image`` (reference:
MainNumpy.py:54-60,108-113).
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import Dict

# -- crc32c (Castagnoli), table-driven --------------------------------------

_CRC_TABLE = []


def _build_table():
    poly = 0x82F63B78
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        _CRC_TABLE.append(c)


_build_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# -- minimal protobuf encoding ----------------------------------------------

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


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f_double(field: int, v: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", v)


def _f_float(field: int, v: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", v)


def _f_varint(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v)


def _f_bytes(field: int, v: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(v)) + v


def _scalar_event(tag: str, value: float, step: int,
                  wall_time: float) -> bytes:
    val = _f_bytes(1, tag.encode()) + _f_float(2, float(value))
    summary = _f_bytes(1, val)
    return (_f_double(1, wall_time) + _f_varint(2, step)
            + _f_bytes(5, summary))


def _file_version_event(wall_time: float) -> bytes:
    # Event.file_version is field 3 (string).
    return _f_double(1, wall_time) + _f_bytes(3, b"brain.Event:2")


# -- PNG encoding (stdlib only) ----------------------------------------------

def png_encode(arr) -> bytes:
    """Encode a uint8 image array as PNG: ``[H, W]`` grayscale, ``[H, W, 3]``
    RGB or ``[H, W, 4]`` RGBA.  Filter-0 scanlines, one zlib IDAT."""
    import numpy as np
    import zlib

    a = np.asarray(arr)
    if a.dtype != np.uint8:
        # A float panel in [0, 1] would truncate to all-0/1 and render as a
        # black image with no error — refuse instead of silently degrading.
        raise TypeError(
            f"png_encode expects uint8 pixels, got {a.dtype}; scale/cast "
            "explicitly (e.g. (x * 255).astype('uint8'))")
    a = np.ascontiguousarray(a)
    if a.ndim == 2:
        a = a[..., None]
    h, w, c = a.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]

    def chunk(kind: bytes, payload: bytes) -> bytes:
        body = kind + payload
        return (struct.pack(">I", len(payload)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + a[row].tobytes() for row in range(h))
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def _image_event(tag: str, arr, step: int, wall_time: float) -> bytes:
    import numpy as np

    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[..., None]
    h, w, c = a.shape
    # Summary.Image: 1=height, 2=width, 3=colorspace (1 gray / 3 RGB /
    # 4 RGBA), 4=encoded_image_string (PNG).
    img = (_f_varint(1, h) + _f_varint(2, w)
           + _f_varint(3, {1: 1, 3: 3, 4: 4}[c])
           + _f_bytes(4, png_encode(a)))
    val = _f_bytes(1, tag.encode()) + _f_bytes(4, img)
    summary = _f_bytes(1, val)
    return (_f_double(1, wall_time) + _f_varint(2, step)
            + _f_bytes(5, summary))


class EventWriter:
    """Append-only TensorBoard events file."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        fname = (f"events.out.tfevents.{int(time.time())}."
                 f"{socket.gethostname()}")
        self._fh = open(os.path.join(log_dir, fname), "ab")
        self._write_record(_file_version_event(time.time()))

    def _write_record(self, payload: bytes) -> None:
        header = struct.pack("<Q", len(payload))
        self._fh.write(header)
        self._fh.write(struct.pack("<I", _masked_crc(header)))
        self._fh.write(payload)
        self._fh.write(struct.pack("<I", _masked_crc(payload)))
        self._fh.flush()

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._write_record(_scalar_event(tag, value, step, time.time()))

    def scalars(self, step: int, values: Dict[str, float]) -> None:
        for k, v in values.items():
            self.scalar(k, v, step)

    def image(self, tag: str, arr, step: int) -> None:
        """Write a uint8 image array (``[H, W]``, ``[H, W, 3]`` or
        ``[H, W, 4]``) as a TensorBoard image summary (the reference's
        ``tf.summary.image`` — MainNumpy.py:54-60)."""
        self._write_record(_image_event(tag, arr, step, time.time()))

    def close(self) -> None:
        self._fh.close()
