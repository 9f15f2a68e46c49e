"""TensorBoard event-writer wire-format tests: TFRecord framing round-trips,
CRC32C matches known vectors, and the scalar Event proto decodes."""

import os
import struct

from ultrasound_modeling_tpu.utils import tb_writer as tb


def test_crc32c_known_vectors():
    # RFC 3720 B.4 test vectors + the canonical check value.
    assert tb.crc32c(b"") == 0x00000000
    assert tb.crc32c(bytes(32)) == 0x8A9136AA
    assert tb.crc32c(bytes([0xFF] * 32)) == 0x62A8AB43
    assert tb.crc32c(bytes(range(32))) == 0x46DD794E
    assert tb.crc32c(b"123456789") == 0xE3069283


def _read_records(path):
    records = []
    with open(path, "rb") as fh:
        while True:
            header = fh.read(8)
            if not header:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", fh.read(4))
            assert hcrc == tb._masked_crc(header)
            payload = fh.read(length)
            (pcrc,) = struct.unpack("<I", fh.read(4))
            assert pcrc == tb._masked_crc(payload)
            records.append(payload)
    return records


def _decode_fields(buf):
    """Minimal proto field walker: returns {field: [values]}."""
    fields = {}
    i = 0
    while i < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:
            val = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                val |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:
            val = struct.unpack("<d", buf[i:i + 8])[0]
            i += 8
        elif wire == 5:
            val = struct.unpack("<f", buf[i:i + 4])[0]
            i += 4
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            val = buf[i:i + ln]
            i += ln
        else:
            raise AssertionError(f"wire {wire}")
        fields.setdefault(field, []).append(val)
    return fields


def test_scalar_event_roundtrip(tmp_path):
    w = tb.EventWriter(str(tmp_path))
    w.scalar("loss", 0.125, step=7)
    w.scalars(8, {"f1": 0.5})
    w.close()
    files = os.listdir(str(tmp_path))
    assert len(files) == 1 and files[0].startswith("events.out.tfevents.")
    records = _read_records(os.path.join(str(tmp_path), files[0]))
    assert len(records) == 3  # file_version + 2 scalars

    ev0 = _decode_fields(records[0])
    assert ev0[3] == [b"brain.Event:2"]

    ev1 = _decode_fields(records[1])
    assert ev1[2] == [7]  # step
    summary = _decode_fields(ev1[5][0])
    value = _decode_fields(summary[1][0])
    assert value[1] == [b"loss"]
    assert abs(value[2][0] - 0.125) < 1e-7
