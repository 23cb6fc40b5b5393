"""Property tests for the real multimodal codecs (no Spark needed):
encode→decode round-trips over arbitrary byte payloads, and the
fail-loud truncation contracts.  Complements the fixture-level oracle
parity (test_oracle_parity) with adversarial inputs the fixtures
never produce — empty payloads, NUL bytes, high bytes, long runs."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from s3_manifest_spark.operators.multimodal import (
    _asset_geometry,
    _audio_geometry,
    decode_ppm_stack,
    decode_wav_pcm,
    encode_ppm_stack,
    encode_wav_pcm,
    ppm_thumbnail,
)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_ppm_roundtrip(payload):
    w, h, f, mean = decode_ppm_stack(encode_ppm_stack(payload))
    ew, eh, ef = _asset_geometry(len(payload))
    assert (w, h, f) == (ew, eh, ef)
    need = ew * eh * 3 * ef
    src = np.frombuffer(payload, dtype=np.uint8)
    pix = np.resize(src, need) if len(src) else np.zeros(need, dtype=np.uint8)
    assert mean == pix.sum(dtype=np.int64) / need


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_wav_roundtrip(payload):
    c, rate, frames, rms = decode_wav_pcm(encode_wav_pcm(payload))
    ec, er, ef = _audio_geometry(len(payload))
    assert (c, rate, frames) == (ec, er, ef)
    total = ef * ec
    src = (np.frombuffer(payload, dtype=np.uint8).astype(np.int64) - 128) * 256
    samples = np.resize(src, total) if len(src) else np.zeros(total, np.int64)
    sumsq = int((samples**2).sum())
    assert rms == math.sqrt(float(sumsq) / total)


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=1, max_size=120))
def test_wav_every_strict_prefix_raises(payload):
    """A WAV's RIFF size covers the whole chunk, so EVERY strict
    prefix is detectably truncated — the fail-loud contract holds at
    every cut point, not just the ones a unit test picks."""
    asset = encode_wav_pcm(payload)
    for cut in range(len(asset)):
        with pytest.raises(ValueError):
            decode_wav_pcm(asset[:cut])


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=1, max_size=120))
def test_ppm_prefix_raises_except_frame_boundaries(payload):
    """PPM stacks are self-delimiting per frame: cutting at a frame
    boundary yields a VALID shorter stack (fewer frames, same
    geometry); cutting anywhere else must raise."""
    asset = encode_ppm_stack(payload)
    w, h, f, _ = decode_ppm_stack(asset)
    frame_len = len(asset) // f
    assert frame_len * f == len(asset)
    boundaries = {i * frame_len for i in range(1, f)}
    for cut in range(1, len(asset)):
        if cut in boundaries:
            bw, bh, bf, _ = decode_ppm_stack(asset[:cut])
            assert (bw, bh) == (w, h) and bf == cut // frame_len
        else:
            with pytest.raises(ValueError):
                decode_ppm_stack(asset[:cut])


def test_ppm_thumbnail_known_image():
    """Nearest-neighbor mapping checked against a hand-built P6: a
    4x2 image downsampled to 2x1 must sample source columns 0 and 2
    of row 0."""
    pixels = bytes(range(24))  # (h=2, w=4, 3): values 0..23
    asset = b"P6\n4 2\n255\n" + pixels
    tw, th, mean = ppm_thumbnail(asset)
    assert (tw, th) == (2, 1)
    # row 0, cols 0 and 2 -> bytes (0,1,2) and (6,7,8)
    assert mean == (0 + 1 + 2 + 6 + 7 + 8) / 6


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_ppm_thumbnail_roundtrip(payload):
    """Thumbnail over the generated asset equals an independent numpy
    resize of the generator's frame-0 pixel plane."""
    asset = encode_ppm_stack(payload)
    tw, th, mean = ppm_thumbnail(asset)
    w, h, _ = _asset_geometry(len(payload))
    assert (tw, th) == (max(w // 2, 1), max(h // 2, 1))
    need = w * h * 3
    src = np.frombuffer(payload, dtype=np.uint8)
    pix = np.resize(src, need) if len(src) else np.zeros(need, dtype=np.uint8)
    frame = pix.reshape(h, w, 3)
    rows = (np.arange(th) * h) // th
    cols = (np.arange(tw) * w) // tw
    thumb = frame[rows][:, cols]
    assert mean == float(int(thumb.sum(dtype=np.int64))) / thumb.size


def test_ppm_rejects_crafted_headers_and_trailing_garbage():
    """Regression pins for the review findings: a negative dimension
    must raise (it previously moved the cursor backwards — an
    infinite loop), and the thumbnail must parse the WHOLE stack, so
    trailing garbage after frame 0 raises instead of decoding
    silently."""
    neg = b"P6\n4 -1\n255\nabcdefghijkl"
    with pytest.raises(ValueError):
        decode_ppm_stack(neg)
    with pytest.raises(ValueError):
        ppm_thumbnail(neg)
    with pytest.raises(ValueError):
        decode_ppm_stack(b"P6\n0 1\n255\n")
    good = b"P6\n2 1\n255\n" + bytes(range(6))
    assert ppm_thumbnail(good) == (1, 1, sum(range(3)) / 3)
    with pytest.raises(ValueError):
        ppm_thumbnail(good + b"GARBAGE_TRAILING")
    with pytest.raises(ValueError):
        ppm_thumbnail(good + b"P6\n3 1\n255\n" + bytes(9))  # drift


def test_wav_rejects_duplicate_chunks():
    """Fail-loud contract: a crafted file with two fmt or two data
    chunks must raise, never decode using the second silently."""
    import struct

    import pytest

    from s3_manifest_spark.operators.multimodal import (
        decode_wav_pcm,
        encode_wav_pcm,
    )

    asset = bytearray(encode_wav_pcm(b"hello audio"))
    fmt_chunk = bytes(asset[12:36])   # 'fmt ' + size + 16-byte body
    data_off = 36

    def with_extra(chunk: bytes) -> bytes:
        out = bytearray(asset)
        out[data_off:data_off] = chunk
        struct.pack_into("<I", out, 4, len(out) - 8)  # fix RIFF size
        return bytes(out)

    with pytest.raises(ValueError, match="duplicate fmt"):
        decode_wav_pcm(with_extra(fmt_chunk))
    dup_data = b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="duplicate data"):
        decode_wav_pcm(with_extra(dup_data))


def test_documents_fixture_is_pure_ascii():
    """The multimodal oracles (_DECODE_SQL/_THUMBNAIL_SQL/
    _AUDIO_DECODE_SQL) do character-based ascii(substring(...))
    arithmetic against the kernel's BYTE math — sound only while
    byte == char, i.e. the documents fixture is pure ASCII.  Assert
    the precondition at every fixture sf so a regenerated non-ASCII
    fixture fails here with a readable message, not as an opaque
    driver hash mismatch."""
    import pyarrow.parquet as pq

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        texts = (
            pq.read_table(
                f"/root/testdata/{sf}/documents.parquet", columns=["text"]
            )
            .column("text")
            .to_pandas()
        )
        assert all(t.isascii() for t in texts), (
            f"{sf}: non-ASCII text in fixture"
        )
