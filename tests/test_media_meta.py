"""Hand-built byte fixtures for extract_media_meta — the audio/video
container twin of the extract_image_meta fixture suite: every field is
hand-derived from the public format spec, never from the code under
test."""

from __future__ import annotations

import struct

import pytest

from knime_core_columnar_spark.operators.multimodal import extract_media_meta


def _wav(rate=16000, ch=2, bits=16, n_bytes=64000, extra_chunk=False):
    """Canonical PCM WAV; with extra_chunk=True a LIST chunk sits
    between fmt and data (non-canonical layout)."""
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * bits // 8,
                      ch * bits // 8, bits)
    body = b"fmt " + struct.pack("<I", 16) + fmt
    if extra_chunk:
        body += b"LIST" + struct.pack("<I", 4) + b"INFO"
    body += b"data" + struct.pack("<I", n_bytes) + b"\x00" * 16
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _flac(rate=44100, ch=2, bits=16, total=441000):
    """fLaC + STREAMINFO (34 bytes): rate 20 bits, ch-1 3 bits,
    bps-1 5 bits, total samples 36 bits."""
    packed = (rate << 44) | ((ch - 1) << 41) | ((bits - 1) << 36) | total
    info = (
        struct.pack(">HH", 4096, 4096)      # min/max block size
        + b"\x00\x00\x00" * 2               # min/max frame size (24-bit)
        + packed.to_bytes(8, "big")
        + b"\x00" * 16                      # md5
    )
    return b"fLaC" + b"\x80" + len(info).to_bytes(3, "big") + info


def _box(name: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + name + body


def _mp4(timescale=600, duration=1800, version=0, audio=None):
    """audio=(rate, ch, bits) adds a trak→mdia→minf→stbl→stsd→mp4a
    chain with a spec-shaped AudioSampleEntry (16.16 fixed rate)."""
    if version == 0:
        mvhd_body = b"\x00\x00\x00\x00" + struct.pack(
            ">IIII", 0, 0, timescale, duration) + b"\x00" * 80
    else:
        mvhd_body = b"\x01\x00\x00\x00" + struct.pack(
            ">QQIQ", 0, 0, timescale, duration) + b"\x00" * 80
    body = _box(b"mvhd", mvhd_body)
    if audio is not None:
        rate, ch, bits = audio
        entry_body = (
            b"\x00" * 6 + b"\x00\x01"          # reserved + data_ref_idx
            + b"\x00" * 8                       # version/revision/vendor
            + struct.pack(">HH", ch, bits)
            + b"\x00" * 4                       # predefined + reserved
            + struct.pack(">I", rate << 16)     # 16.16 fixed samplerate
        )
        stsd_body = b"\x00" * 4 + struct.pack(">I", 1) + _box(
            b"mp4a", entry_body)
        body += _box(b"trak", _box(b"mdia", _box(b"minf", _box(
            b"stbl", _box(b"stsd", stsd_body)))))
    moov = _box(b"moov", body)
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00\x00\x02\x00"
    return ftyp + moov


def _run(spark, payloads, **kw):
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, payload binary",
    )
    rows = extract_media_meta(df, **kw).collect()
    return {r["doc_id"]: r.asDict() for r in rows}

def test_media_meta_catalyst_tier(spark):
    got = _run(spark, [
        _wav(rate=16000, ch=2, bits=16, n_bytes=64000),   # 0: canonical
        _wav(extra_chunk=True),                           # 1: non-canon
        _flac(rate=44100, ch=2, bits=16, total=441000),   # 2
        _mp4(),                                           # 3
        b"ID3\x04\x00\x00" + b"\x00" * 16,                # 4: mp3 (ID3)
        b"\xff\xfb\x90\x00" + b"\x00" * 16,               # 5: mp3 (sync)
        b"OggS" + b"\x00" * 24,                           # 6
        b"\x1a\x45\xdf\xa3" + b"\x00" * 16,               # 7: matroska
        b"not media at all",                              # 8
    ])
    # 64000 bytes / (16000 Hz × 2 ch × 2 B) = 1.0 s
    assert got[0] == {"doc_id": 0, "media_format": "wav",
                      "sample_rate": 16000, "channels": 2,
                      "bits_per_sample": 16, "duration_ms": 1000}
    # fmt parses at its fixed offset; duration needs the data chunk,
    # which the LIST chunk displaced
    assert got[1]["media_format"] == "wav"
    assert got[1]["sample_rate"] == 16000
    assert got[1]["duration_ms"] is None
    # 441000 samples / 44100 Hz = 10.0 s
    assert got[2] == {"doc_id": 2, "media_format": "flac",
                      "sample_rate": 44100, "channels": 2,
                      "bits_per_sample": 16, "duration_ms": 10000}
    assert got[3]["media_format"] == "mp4"
    assert got[3]["duration_ms"] is None  # mvhd needs the deep walk
    assert got[4]["media_format"] == "mp3"
    assert got[5]["media_format"] == "mp3"
    assert got[6]["media_format"] == "ogg"
    assert got[7]["media_format"] == "matroska"
    assert got[8]["media_format"] is None


def test_media_meta_deep_walk(spark):
    got = _run(spark, [
        _wav(extra_chunk=True),          # deep WAV chunk walk
        _mp4(timescale=600, duration=1800, version=0),   # 3.0 s
        _mp4(timescale=90000, duration=90000 * 7, version=1),  # 7.0 s
        _wav(),                          # canonical: Catalyst tier keeps it
        _mp4(timescale=1000, duration=2500, version=0,
             audio=(48000, 2, 16)),      # mp4a sample entry
    ], parse_deep=True)
    assert got[0]["duration_ms"] == 1000
    assert got[0]["sample_rate"] == 16000
    assert got[1]["duration_ms"] == 3000
    assert got[1]["sample_rate"] is None  # no audio track in fixture
    assert got[2]["duration_ms"] == 7000
    assert got[3]["duration_ms"] == 1000
    assert got[4] == {"doc_id": 4, "media_format": "mp4",
                      "sample_rate": 48000, "channels": 2,
                      "bits_per_sample": 16, "duration_ms": 2500}


def test_media_meta_flac_odd_geometry(spark):
    """Non-round FLAC fields exercise every bit boundary: 22050 Hz,
    1 channel, 24-bit, 11025 samples = 500 ms."""
    got = _run(spark, [_flac(rate=22050, ch=1, bits=24, total=11025)])
    assert got[0] == {"doc_id": 0, "media_format": "flac",
                      "sample_rate": 22050, "channels": 1,
                      "bits_per_sample": 24, "duration_ms": 500}


def test_media_meta_truncated_payloads_null_not_crash(spark):
    got = _run(spark, [b"RIFF", b"fLaC\x80", b"", b"\x00" * 3],
               parse_deep=True)
    assert all(v["duration_ms"] is None for v in got.values())
