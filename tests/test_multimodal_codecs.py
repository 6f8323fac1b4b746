"""Stdlib media codecs: the WAV writer/parser and PPM writer/parser
must round-trip bit-exactly and survive real-world container quirks
(extra chunks, odd-size padding, header comments) — they are REAL
decoders, not stubs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kittispark.operators.multimodal import (
    decode_media,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav_pcm16,
)


def test_wav_roundtrip_bit_exact():
    s = np.array([0, 1, -1, 32767, -32768, 12345], dtype="int16")
    wav = encode_wav_pcm16(s, sample_rate=44_100)
    out = decode_wav(wav)
    assert out["sample_rate"] == 44_100
    assert out["n_channels"] == 1
    assert np.array_equal(out["samples"], s)


def test_wav_parser_skips_extra_chunks():
    """Real WAVs carry LIST/INFO/fact chunks between fmt and data —
    the parser must walk past them, including odd-size padding."""
    s = np.array([7, -7, 100], dtype="int16")
    wav = encode_wav_pcm16(s, sample_rate=8_000)
    header, data = wav[:36], wav[36:]
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"  # odd size + pad
    spliced = header + extra + data
    # fix the RIFF size field
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    out = decode_wav(spliced)
    assert np.array_equal(out["samples"], s)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not a wav at all")
    with pytest.raises(ValueError, match="PCM16"):
        # valid container, float format tag (3)
        bad = struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36, b"WAVE",
            b"fmt ", 16, 3, 1, 8000, 32000, 4, 32,
            b"data", 0,
        )
        decode_wav(bad)


def test_ppm_roundtrip():
    rgb = bytes(range(2 * 3 * 3))
    ppm = encode_ppm(2, 3, rgb)
    out = decode_ppm(ppm)
    assert (out["width"], out["height"]) == (2, 3)
    assert out["pixels"].shape == (3, 2, 3)
    assert out["pixels"].tobytes() == rgb


def test_ppm_header_comments():
    rgb = bytes(12)
    ppm = b"P6\n# made by a real tool\n2 2\n# another\n255\n" + rgb
    out = decode_ppm(ppm)
    assert (out["width"], out["height"]) == (2, 2)


def test_ppm_rejects_non_p6():
    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"P3\n1 1\n255\n0 0 0")


def test_decode_media_dispatch():
    s = np.array([100, -100], dtype="int16")
    audio = decode_media("audio", encode_wav_pcm16(s, sample_rate=16_000))
    assert audio["feature"][0] == 2.0  # n_samples
    assert audio["feature"][1] == 16_000.0
    assert audio["feature"][2] == 0.0  # mean
    assert audio["feature"][3] == 100.0  # rms

    img = decode_media("image", encode_ppm(1, 1, bytes([10, 20, 30])))
    assert img["feature"][:3] == [10.0, 20.0, 30.0]
    assert (img["width"], img["height"]) == (1, 1)

    # video is a REAL decode now: MPPM container of PPM frames
    from kittispark.operators.multimodal import decode_mppm, encode_mppm

    frames = [
        (1, 1, bytes([10, 20, 30])),
        (1, 1, bytes([40, 50, 60])),
    ]
    payload = encode_mppm(frames)
    vid = decode_media("video", payload)
    assert vid["feature"][0] == 2.0  # n_frames
    assert vid["feature"][1] == 35.0  # mean over all pixels
    assert vid["feature"][2] == 20.0  # first frame mean
    assert vid["feature"][3] == 50.0  # last frame mean
    assert (vid["width"], vid["height"]) == (1, 1)
    decoded = decode_mppm(payload)
    assert [f["pixels"].tobytes() for f in decoded] == [f[2] for f in frames]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="MPPM"):
        decode_media("video", b"\x01\x02\x03")
    with _pytest.raises(ValueError, match="exceeds remaining"):
        decode_mppm(payload[:-2])


def test_avi_rejects_mismatched_frame_dims():
    # 4x2 and 2x4 share a byte count; the encoder must reject the
    # geometry mismatch instead of silently resegmenting rows
    import pytest
    from kittispark.operators.multimodal import encode_avi_rgb

    a = bytes(range(24))
    with pytest.raises(ValueError, match="must match frame 0"):
        encode_avi_rgb([(4, 2, a), (2, 4, a)])
