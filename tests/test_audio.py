"""From-scratch WAV codec + feature tests (stages/audio.py).

Golden strategy mirrors test_jpeg.py: square waves have closed-form
exact-integer features (peak = a, sumsq = ch*n*a^2, zcr = half-1), and
PCM roundtrips are bit-exact by construction, so no reference decoder
is needed. Hand-assembled streams cover layouts the encoder never
emits (WAVE_FORMAT_EXTENSIBLE, unknown chunks, odd-sized chunk
padding).
"""

import struct

import numpy as np
import pandas as pd
import pytest

from socialmapper_ray.stages.audio import (WavAudioDecoder, wav_decode,
                                           wav_encode, wav_features)

RNG = np.random.default_rng(20260818)


def square_wave(a: int, p: int, half: int, ch: int = 1) -> np.ndarray:
    c0 = np.tile(np.repeat(np.array([a, -a], dtype=np.int64), p), half // 2)
    return np.stack([c0] * ch, axis=1)


# ---------------------------------------------------------------------------
# Roundtrips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_pcm_roundtrip_exact(bits):
    lim = 127 if bits == 8 else (1 << (bits - 1)) - 1
    x = RNG.integers(-lim - (0 if bits == 8 else 1), lim,
                     size=(311, 2), endpoint=True)
    w = wav_decode(wav_encode(x, 22050, bits=bits))
    assert w.sample_rate == 22050 and w.bits == bits and w.fmt == 1
    assert w.samples.shape == (311, 2)
    assert (w.samples == x).all()


def test_pcm_24bit_sign_extension():
    x = np.array([[-(1 << 23)], [(1 << 23) - 1], [-1], [0], [1]])
    w = wav_decode(wav_encode(x, 8000, bits=24))
    assert (w.samples == x).all()


@pytest.mark.parametrize("bits,atol", [(32, 1e-7), (64, 0.0)])
def test_float_roundtrip(bits, atol):
    x = RNG.standard_normal((100, 3)) * 0.4
    w = wav_decode(wav_encode(x, 48000, bits=bits, fmt=3))
    assert w.fmt == 3
    assert np.allclose(w.samples, x, atol=atol)


def test_mono_1d_input():
    x = np.arange(-5, 5, dtype=np.int64)
    w = wav_decode(wav_encode(x, 8000))
    assert w.samples.shape == (10, 1)
    assert (w.samples[:, 0] == x).all()


# ---------------------------------------------------------------------------
# Analytic features
# ---------------------------------------------------------------------------

def test_square_wave_features_exact():
    a, p, half, ch = 12345, 7, 10, 2
    f = wav_features(wav_encode(square_wave(a, p, half, ch), 8000))
    n = half * p
    assert f == {"sample_rate": 8000, "channels": ch, "bits": 16,
                 "n_samples": n, "duration_us": n * 125, "peak_q": a,
                 "sumsq_q": ch * n * a * a, "zcr_count": half - 1}


def test_sine_rms_analytic():
    """Full periods of a float sine: RMS = amplitude / sqrt(2) — checks
    the float path + int16 quantization against closed form."""
    sr, freq, amp, n = 8000, 250, 0.5, 4000          # 125 full periods
    t = np.arange(n) / sr
    # phase offset keeps zero samples off the grid (a sample of exactly
    # 0 is invisible to the strict sign-flip counter); the RMS over
    # full periods is amp/sqrt(2) for ANY phase
    x = amp * np.sin(2 * np.pi * freq * t + 0.1)
    f = wav_features(wav_encode(x, sr, bits=32, fmt=3))
    rms = np.sqrt(f["sumsq_q"] / f["n_samples"]) / 32767
    assert abs(rms - amp / np.sqrt(2)) < 1e-4
    assert abs(f["zcr_count"] - 2 * 125) <= 2        # 2 crossings/period


def test_32bit_sumsq_no_overflow():
    """Two near-max int32 samples: each square is ~2^62, the exact sum
    needs arbitrary precision — pins the object-dtype path."""
    v = (1 << 31) - 1
    f = wav_features(wav_encode(np.array([v, -v]), 8000, bits=32))
    assert f["sumsq_q"] == 2 * v * v
    assert f["peak_q"] == v


# ---------------------------------------------------------------------------
# Hand-assembled layouts
# ---------------------------------------------------------------------------

def test_extensible_fmt_and_unknown_chunks():
    """WAVE_FORMAT_EXTENSIBLE header + LIST/fact chunks + an odd-sized
    chunk needing a pad byte — all spec-legal, none encoder-emitted."""
    x = np.array([100, -200, 300], dtype=np.int64)
    payload = x.astype("<i2").tobytes()
    guid = struct.pack("<H", 1) + b"\x00\x00" \
        + bytes.fromhex("00001000800000aa00389b71")
    fmt = struct.pack("<HHIIHHHHI", 0xFFFE, 1, 8000, 16000, 2, 16,
                      22, 16, 0x4) + guid
    body = bytearray(b"WAVE")
    body += b"junk" + struct.pack("<I", 3) + b"abc\x00"     # odd + pad
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<I", 4) + struct.pack("<I", 3)
    body += b"data" + struct.pack("<I", len(payload)) + payload
    blob = b"RIFF" + struct.pack("<I", len(body)) + bytes(body)
    w = wav_decode(blob)
    assert w.fmt == 1 and w.bits == 16
    assert (w.samples[:, 0] == x).all()


@pytest.mark.parametrize("mutate", [
    lambda b: b[:10],                                  # truncated header
    lambda b: b"RIFX" + b[4:],                         # bad magic
    lambda b: b[:8] + b"MP3 " + b[12:],                # not WAVE
    lambda b: b.replace(b"data", b"datx"),             # missing data
    lambda b: b.replace(b"fmt ", b"fmtx"),             # missing fmt
    lambda b: b[:-3],                                  # truncated data
])
def test_malformed_raises(mutate):
    blob = wav_encode(np.array([1, -2, 3, -4]), 8000)
    with pytest.raises(ValueError):
        wav_decode(mutate(blob))


def test_compressed_format_refused():
    blob = bytearray(wav_encode(np.array([1, -2]), 8000))
    blob[20] = 2                                       # ADPCM format code
    with pytest.raises(ValueError, match="format 2"):
        wav_decode(bytes(blob))


def test_inconsistent_block_align_raises():
    blob = bytearray(wav_encode(np.array([1, -2]), 8000))
    blob[32] = 3                                       # block_align 2 -> 3
    with pytest.raises(ValueError, match="block_align"):
        wav_decode(bytes(blob))


# ---------------------------------------------------------------------------
# Stage contract
# ---------------------------------------------------------------------------

def test_decoder_stage_contract():
    df = pd.DataFrame({
        "media_id": [1, 2],
        "payload": [wav_encode(square_wave(100, 4, 6), 8000),
                    wav_encode(square_wave(200, 5, 8, ch=2), 16000)]})
    out = WavAudioDecoder()(df)
    assert "payload" not in out.columns
    assert out["peak_q"].tolist() == [100, 200]
    assert out["zcr_count"].tolist() == [5, 7]
    assert out["channels"].tolist() == [1, 2]
    assert out["duration_us"].tolist() == [3000, 2500]
    empty = WavAudioDecoder()(df.iloc[:0])
    assert list(empty.columns) == list(out.columns)
    assert all(empty[c].dtype == out[c].dtype for c in out.columns
               if c != "media_id")


def test_decoder_stage_corrupt_payload_raises():
    df = pd.DataFrame({"media_id": [1], "payload": [b"not a wav"]})
    with pytest.raises(ValueError):
        WavAudioDecoder()(df)
