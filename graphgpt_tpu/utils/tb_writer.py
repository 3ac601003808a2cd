"""Dependency-free TensorBoard event-file writer.

The reference initialises a torch SummaryWriter behind `use_tb_writer`
(off by default) and logs scalar lr/loss per logging step plus parameter
histograms per checkpoint (src/utils/log_eval_dump_utils.py:817-866,
:538-540, :642-645). This module reimplements the on-disk format directly
— TFRecord framing (length + masked CRC32C) around hand-encoded Event
protos — so no tensorflow/torch import is needed on the training path.
The encoding is differentially tested against tensorboard's own event
file loader (tests/test_tb_writer.py).

Proto schema (field numbers from tensorboard.compat.proto):
  Event        { double wall_time=1; int64 step=2; string file_version=3;
                 Summary summary=5; }
  Summary      { repeated Value value=1; }
  Value        { string tag=1; float simple_value=2; HistogramProto histo=5; }
  HistogramProto { double min=1,max=2,num=3,sum=4,sum_squares=5;
                   repeated double bucket_limit=6 [packed];
                   repeated double bucket=7 [packed]; }
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import Optional

import numpy as np

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli), table-driven — the TFRecord checksum
# ---------------------------------------------------------------------------
_CRC_TABLE = []


def _crc_table():
    global _CRC_TABLE
    if _CRC_TABLE:
        return _CRC_TABLE
    poly = 0x82F63B78
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    _CRC_TABLE = table
    return table


def _crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Minimal protobuf wire encoding
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


def _tag(field: int, wire: int) -> bytes:
    return _varint(field << 3 | wire)


def _f_double(field: int, v: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", v)


def _f_float(field: int, v: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", v)


def _f_varint(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _f_bytes(field: int, v: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(v)) + v


def _f_packed_doubles(field: int, vals) -> bytes:
    body = b"".join(struct.pack("<d", float(v)) for v in vals)
    return _f_bytes(field, body)


def _encode_value_scalar(tag: str, value: float) -> bytes:
    return _f_bytes(1, tag.encode()) + _f_float(2, float(value))


def _encode_histo(arr: np.ndarray) -> bytes:
    """HistogramProto with tensorboard's default exponential buckets."""
    arr = np.asarray(arr, np.float64).reshape(-1)
    if arr.size == 0:
        arr = np.zeros(1)
    # exponential bucket edges: ..., -1.1^k, ..., 0, ..., 1.1^k, ...
    pos = [1e-12]
    while pos[-1] < 1e20:
        pos.append(pos[-1] * 1.1)
    limits = np.asarray([-x for x in reversed(pos)] + [0.0] + pos)
    counts, _ = np.histogram(arr, bins=np.concatenate([[-np.inf], limits]))
    nz = np.flatnonzero(counts)
    if len(nz):
        lo, hi = nz[0], nz[-1]
        lims, cnts = limits[lo : hi + 1], counts[lo : hi + 1]
    else:
        lims, cnts = limits[:1], counts[:1]
    body = (
        _f_double(1, float(arr.min()))
        + _f_double(2, float(arr.max()))
        + _f_double(3, float(arr.size))
        + _f_double(4, float(arr.sum()))
        + _f_double(5, float(np.square(arr).sum()))
        + _f_packed_doubles(6, lims)
        + _f_packed_doubles(7, cnts)
    )
    return body


def _encode_event(step: Optional[int] = None, wall_time: Optional[float] = None,
                  file_version: Optional[str] = None, summary: Optional[bytes] = None) -> bytes:
    out = _f_double(1, wall_time if wall_time is not None else time.time())
    if step is not None:
        out += _f_varint(2, int(step))
    if file_version is not None:
        out += _f_bytes(3, file_version.encode())
    if summary is not None:
        out += _f_bytes(5, summary)
    return out


class SummaryWriter:
    """Writes `events.out.tfevents.*` files readable by TensorBoard.

    API mirrors the subset the reference uses: add_scalar / add_histogram /
    flush / close (log_eval_dump_utils.py:538, :645)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        fname = "events.out.tfevents.%010d.%s.%d.v2" % (
            int(time.time()),
            socket.gethostname(),
            os.getpid(),
        )
        self.path = os.path.join(log_dir, fname)
        self._f = open(self.path, "ab")
        self._write_record(_encode_event(wall_time=time.time(), file_version="brain.Event:2"))
        self.flush()

    def _write_record(self, payload: bytes):
        header = struct.pack("<Q", len(payload))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", _masked_crc(payload)))

    def add_scalar(self, tag: str, value: float, step: int):
        summary = _f_bytes(1, _encode_value_scalar(tag, value))
        self._write_record(_encode_event(step=step, summary=summary))

    def add_histogram(self, tag: str, values, step: int):
        value = _f_bytes(1, _f_bytes(1, tag.encode()) + _f_bytes(5, _encode_histo(values)))
        self._write_record(_encode_event(step=step, summary=value))

    def flush(self):
        self._f.flush()

    def close(self):
        self.flush()
        self._f.close()


def maybe_tb_writer(output_dir: str, use_tb_writer: bool, process_index: int = 0):
    """rank-0-only writer creation with the SUMMARY_DIR override (reference
    _dump_ds_cfg_and_init_tb, log_eval_dump_utils.py:817-841)."""
    if not use_tb_writer or process_index != 0:
        return None
    summary_dir = os.environ.get("SUMMARY_DIR", os.path.join(output_dir, "summary"))
    return SummaryWriter(summary_dir)
