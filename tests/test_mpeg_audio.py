"""MPEG-1 Audio Layer I codec (operators/mpeg_audio.py): filterbank
reconstruction quality, spec-framed bitstream round trip, metadata
agreement with parse_mp3, feature-path integration, and the honest
Layer II/III stub."""

import numpy as np
import pytest

from crux_spark.operators import mpeg_audio as M
from crux_spark.operators.multimodal import parse_mp3

RATE = 32000


def _tone(seconds=1.0, freqs=((1000, 0.5), (5000, 0.2))):
    n = np.arange(int(RATE * seconds))
    return sum(a * np.sin(2 * np.pi * f * n / RATE) for f, a in freqs)


def _snr(ref, out):
    m = min(len(ref), len(out))
    lo, hi = 4096, m - 4096
    g = np.dot(out[lo:hi], ref[lo:hi]) / np.dot(ref[lo:hi], ref[lo:hi])
    err = out[lo:hi] / g - ref[lo:hi]
    return 10 * np.log10(np.sum(ref[lo:hi] ** 2) / np.sum(err ** 2))


def test_filterbank_round_trip_snr():
    """Unquantized analysis->synthesis must be near-perfect
    reconstruction (the in-code-designed prototype's alias cancellation
    is MEASURED, not assumed — a naive cutoff-pi/64 sinc gives ~29 dB,
    the tuned design >60 dB)."""
    ana, syn = M._matrices()
    n = np.arange(32768)
    x = (0.3 * np.sin(2 * np.pi * 0.0213 * n)
         + 0.2 * np.sin(2 * np.pi * 0.19 * n)
         + 0.15 * np.sin(2 * np.pi * 0.37 * n)
         + 0.1 * np.sin(2 * np.pi * 0.46 * n))
    y = M._synthesize_with(syn, M._analyze_with(ana, x))[M.TAPS:]
    assert _snr(x, y) > 55.0


def test_layer1_bitstream_round_trip():
    """encode_layer1 -> decode_layer1: real samples back out, >50 dB at
    12-bit allocation, and the dominant spectral peak lands on the
    encoded tone."""
    x = _tone()
    blob = M.encode_layer1(x, rate=RATE, nb=12)
    rate, y = M.decode_layer1(blob)
    assert rate == RATE
    assert _snr(x, y) > 50.0
    lo, hi = 4096, min(len(x), len(y)) - 4096
    spec = np.abs(np.fft.rfft(y[lo:hi] * np.hanning(hi - lo)))
    freqs = np.fft.rfftfreq(hi - lo, 1.0 / RATE)
    assert abs(freqs[np.argmax(spec)] - 1000.0) < 5.0


def test_layer1_frames_parse_as_valid_mpeg():
    """parse_mp3 must walk the encoder's frames as spec MPEG-1 Layer I:
    right layer/rate/duration/bitrate, constant-bitrate stream."""
    blob = M.encode_layer1(_tone(0.5), rate=RATE, nb=12)
    meta = parse_mp3(blob)
    assert meta is not None
    assert meta["layer"] == 1 and meta["version"] == "1"
    assert meta["sample_rate"] == RATE and meta["mode"] == "mono"
    assert not meta["vbr"]
    assert meta["bitrate_kbps"] in (384, 416, 448)
    assert abs(meta["duration_s"] - 0.5) < 0.02


def test_coarse_allocation_degrades_gracefully():
    """Fewer allocation bits -> lower-but-real fidelity (the spec
    requantization formula at work, not a pass-through)."""
    x = _tone()
    snr_fine = _snr(x, M.decode_layer1(M.encode_layer1(x, rate=RATE, nb=12))[1])
    snr_coarse = _snr(x, M.decode_layer1(M.encode_layer1(x, rate=RATE, nb=6))[1])
    assert snr_coarse > 20.0  # still a real decode of the waveform
    assert snr_fine > snr_coarse + 15.0  # quantization dominates


def test_layer2_and_3_samples_are_honest_stubs():
    """Layer II/III sample decode raises with the documented reason (no
    fabricated allocation tables); metadata still parses."""
    x = _tone(0.2)
    blob = bytearray(M.encode_layer1(x, rate=RATE, nb=8))
    # flip the layer bits of every frame header from I (11) to II (10):
    # walk frames like the parser does
    i = 0
    while i + 4 <= len(blob):
        if blob[i] == 0xFF and (blob[i + 1] & 0xE0) == 0xE0:
            blob[i + 1] = (blob[i + 1] & ~0b110) | 0b100
            kbps = M._MP3_L1_KBPS[(blob[i + 2] >> 4) & 0xF]
            # Layer II frame walk length differs; just rewrite the first
            # header and stop — parse_mp3 reads layer from frame 1
            break
        i += 1
    meta = parse_mp3(bytes(blob))
    assert meta is not None and meta["layer"] == 2
    with pytest.raises(NotImplementedError, match="Layer 2"):
        M.decode_layer1(bytes(blob))


def test_feature_path_uses_real_layer1_samples(spark):
    """extract_features over an encoded Layer I blob must produce
    _audio_features of the DECODED waveform (duration/RMS/ZCR), not the
    byte-histogram fake."""
    from crux_spark.operators.multimodal import (
        _audio_features,
        _fake_decode,
        extract_features,
    )

    x = _tone(0.5)
    blob = M.encode_layer1(x, rate=RATE, nb=12)
    media = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, blob binary"
    )
    row = extract_features(media).collect()[0]
    rate, y = M.decode_layer1(blob)
    assert row.features == pytest.approx(_audio_features(rate, y), abs=1e-6)
    assert row.features != pytest.approx(_fake_decode(blob), abs=1e-3)
    # sanity on the physics: ~0.5s duration, RMS of the two-tone mix
    assert abs(row.features[0] - 0.5) < 0.02
    # ~5% passband gain tolerance on the designed (non-table) prototype
    assert abs(row.features[1] - np.sqrt(0.5 ** 2 / 2 + 0.2 ** 2 / 2)) < 0.03
