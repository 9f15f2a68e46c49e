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


def test_image_event_roundtrip(tmp_path):
    """Image summaries decode as Summary.Value field 4 (Image) with a valid
    PNG payload — the reference's tf.summary.image panel timeline
    (reference: MainNumpy.py:54-60,108-113)."""
    import numpy as np

    img = (np.arange(20 * 12).reshape(20, 12) * 3 % 256).astype(np.uint8)
    w = tb.EventWriter(str(tmp_path))
    w.image("panel", img, step=42)
    w.close()
    files = os.listdir(str(tmp_path))
    records = _read_records(os.path.join(str(tmp_path), files[0]))
    assert len(records) == 2  # file_version + image

    ev = _decode_fields(records[1])
    assert ev[2] == [42]  # step
    value = _decode_fields(_decode_fields(ev[5][0])[1][0])
    assert value[1] == [b"panel"]
    image = _decode_fields(value[4][0])
    assert image[1] == [20] and image[2] == [12] and image[3] == [1]
    png = image[4][0]
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # decode the PNG back and compare pixels (IHDR dims + zlib scanlines)
    ihdr = png[16:29]
    width, height = struct.unpack(">II", ihdr[:8])
    assert (width, height) == (12, 20)
    import zlib
    idat_off = png.index(b"IDAT")
    (idat_len,) = struct.unpack(">I", png[idat_off - 4:idat_off])
    raw = zlib.decompress(png[idat_off + 4:idat_off + 4 + idat_len])
    rows = np.frombuffer(raw, np.uint8).reshape(20, 13)
    assert (rows[:, 0] == 0).all()  # filter byte 0 per scanline
    np.testing.assert_array_equal(rows[:, 1:], img)


def test_metric_logger_routes_images_to_tb(tmp_path):
    """MetricLogger.images must land in the events file (not only loose
    PNGs)."""
    import numpy as np

    from ultrasound_modeling_tpu.utils.logging import MetricLogger

    lg = MetricLogger(str(tmp_path))
    pred = np.random.default_rng(0).random((16, 10))
    truth = np.random.default_rng(1).random((16, 10))
    lg.images(5, "val", pred, truth)
    lg.close()
    event_files = [f for f in os.listdir(str(tmp_path))
                   if f.startswith("events.out.tfevents.")]
    assert len(event_files) == 1
    records = _read_records(os.path.join(str(tmp_path), event_files[0]))
    img_events = []
    for rec in records[1:]:
        ev = _decode_fields(rec)
        if 5 not in ev:
            continue
        value = _decode_fields(_decode_fields(ev[5][0])[1][0])
        if 4 in value:
            img_events.append((ev[2][0], value))
    assert len(img_events) == 1
    step, value = img_events[0]
    assert step == 5 and value[1] == [b"val"]
    image = _decode_fields(value[4][0])
    # side-by-side panel: width doubles
    assert image[1] == [16] and image[2] == [20]
    assert image[4][0][:8] == b"\x89PNG\r\n\x1a\n"
