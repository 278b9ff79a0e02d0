"""MPEG-1 Audio Layer I sample decode (pure numpy, public spec).

The reference treats audio blobs as opaque; this engine catalogs them
(multimodal.parse_mp3 frame-walk) and, for Layer I streams, now decodes
REAL samples so audio features (RMS/ZCR/spectral) come from the actual
waveform, not a byte histogram.

Everything here derives from the PUBLIC ISO/IEC 11172-3 structure and
widely-published tutorial descriptions of the MPEG-1 filterbank (e.g.
D. Pan, "A Tutorial on MPEG/Audio Compression", IEEE MultiMedia 1995):

- Frame layout (§2.4.1): header / 4-bit allocations x 32 subbands /
  6-bit scalefactors / 12 granules x 32 subbands of nb-bit samples.
- Scalefactors (Table B.1 closed form): sf[i] = 2 * 2^(-i/3).
- Requantization (§2.4.3.2): with nb bits and raw code c,
  s''' = c / 2^(nb-1) - 1;  s'' = (2^nb / (2^nb - 1)) * (s''' + 2^(1-nb))
  then s = s'' * scalefactor.
- Synthesis: 32-band cosine-modulated pseudo-QMF. The spec ships its
  prototype window as a 512-value numeric table (Table B.3, no closed
  form); we DESIGN an equivalent near-perfect-reconstruction prototype
  in code (windowed sinc, cutoff pi/64, Kaiser window) and verify the
  analysis/synthesis pair numerically (tests assert >30 dB round-trip
  SNR). Streams produced by table-B.3 encoders therefore decode with a
  slightly different (but near-PR) reconstruction filter - correct
  waveform, not bit-exact vs a reference decoder; this is documented,
  not hidden.

Layer II adds per-(bitrate, rate) allocation tables (B.2a-d) and
quantization-class grouping - large numeric spec tables that cannot be
re-derived from a formula. CLOSED NON-GOAL (r10 decision, recorded in
COVERAGE.md): no conformance decoder exists in-sandbox to verify a
transcription against, and a self-consistent encode/decode round trip
would pass >50 dB while still silently mis-decoding real third-party
streams — the exact failure this stub guards against. Layer II/III
SAMPLE decode therefore raises with this explanation; metadata for all
layers comes from multimodal.parse_mp3.
"""

from __future__ import annotations

import numpy as np

N_BANDS = 32
TAPS = 512
_SHIFT = N_BANDS  # critically-sampled: 32 new input samples per granule


def _prototype() -> np.ndarray:
    """512-tap near-perfect-reconstruction PQMF prototype: Kaiser-
    windowed sinc, symmetry center at tap 256 (the spec table's
    convention). Cutoff factor 1.1 and beta 6.2 were grid-searched for
    alias cancellation — they put the response's -3 dB point at the
    band edge (power complementarity), giving a 64.7 dB round-trip SNR
    for the analysis/synthesis cascade (asserted by tests; a plain
    cutoff-pi/64 sinc manages only ~29 dB)."""
    m = np.arange(TAPS) - 256.0
    cf = 1.1
    h = cf * np.sinc(m * cf / 64.0) / 64.0
    h *= np.kaiser(TAPS, 6.2)
    return h


def _filterbank_matrices() -> tuple[np.ndarray, np.ndarray]:
    """(analysis, synthesis) matrices of the cosine-modulated PQMF:
    ana[k, tau] = h[tau] * cos((2k+1)(tau - 16) pi/64)
    syn[k, tau] = g * h[tau] * cos((2k+1)(tau + 16) pi/64)
    The +-16 phase offset is what makes adjacent-band aliasing cancel
    (the classic MPEG pseudo-QMF construction). The overall gain g is
    calibrated once, numerically, so analysis->synthesis is unity-gain
    on a mid-band tone — deterministic, and checked by tests."""
    h = _prototype()
    tau = np.arange(TAPS)
    k = np.arange(N_BANDS)[:, None]
    ana = h * np.cos((2 * k + 1) * (tau - 16.0) * np.pi / 64.0)
    syn = h * np.cos((2 * k + 1) * (tau + 16.0) * np.pi / 64.0)
    # calibrate unity round-trip gain (comes out at exactly 1/128 for
    # this design; measured, not assumed). The cascade's group delay is
    # TAPS samples — align before the projection.
    n = np.arange(TAPS * 16)
    x = np.sin(2 * np.pi * 0.07 * n)
    s = _analyze_with(ana, x)
    y = _synthesize_with(syn, s)[TAPS : TAPS + len(x)]
    lo, hi = 2048, len(x) - 2048
    gain = float(np.dot(y[lo:hi], x[lo:hi]) / np.dot(x[lo:hi], x[lo:hi]))
    return ana, syn / gain


def _analyze_with(ana: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Subband analysis: s[k, m] = sum_tau ana[k, tau] * x[32m - tau].
    Returns (32, n_granules)."""
    x = np.asarray(x, dtype=np.float64)
    pad = np.concatenate([np.zeros(TAPS - 1), x])
    win = np.lib.stride_tricks.sliding_window_view(pad, TAPS)[::_SHIFT]
    # window w at granule m holds x[32m - 511 .. 32m]; reverse to tau order
    return (win[:, ::-1] @ ana.T).T


def _synthesize_with(syn: np.ndarray, s: np.ndarray) -> np.ndarray:
    """Overlap-add synthesis: x[n] = sum_k sum_m syn[k, n - 32m] s[k, m]."""
    n_gran = s.shape[1]
    out = np.zeros(_SHIFT * n_gran + TAPS)
    contrib = syn.T @ s  # (TAPS, n_gran)
    for m in range(n_gran):
        out[m * _SHIFT : m * _SHIFT + TAPS] += contrib[:, m]
    return out


_ANA: np.ndarray | None = None
_SYN: np.ndarray | None = None


def _matrices() -> tuple[np.ndarray, np.ndarray]:
    global _ANA, _SYN
    if _ANA is None:
        _ANA, _SYN = _filterbank_matrices()
    return _ANA, _SYN


# Table B.1 closed form: 2 * 2^(-i/3), i = 0..62
_SCALEFACTORS = 2.0 * 2.0 ** (-np.arange(63) / 3.0)

_L1_RATES = {44100: 0, 48000: 1, 32000: 2}
_L1_BITRATES = [0, 32, 64, 96, 128, 160, 192, 224,
                256, 288, 320, 352, 384, 416, 448]


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self, pad_to: int | None = None) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        by = bytearray()
        for i in range(0, len(bits), 8):
            v = 0
            for b in bits[i : i + 8]:
                v = (v << 1) | b
            by.append(v)
        if pad_to is not None:
            by.extend(b"\x00" * (pad_to - len(by)))
        return bytes(by)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


def encode_layer1(samples: np.ndarray, rate: int = 32000, nb: int = 12,
                  kbps: int | None = None) -> bytes:
    """Mono MPEG-1 Layer I encoder (fixture/test path): fixed uniform
    allocation of ``nb`` bits per subband, per-frame scalefactor from
    each subband's peak (Table B.1 closed form), spec quantization
    (inverse of the decoder's §2.4.3.2 formula). Emits spec-framed
    output that parse_mp3 walks and decode_layer1 (or any Layer I
    decoder) reads. ``kbps`` defaults to the smallest table rate whose
    frame holds header + allocations + scalefactors + 384*nb sample
    bits."""
    if rate not in _L1_RATES:
        raise ValueError(f"Layer I MPEG-1 rates: {sorted(_L1_RATES)}")
    if not 2 <= nb <= 15:
        raise ValueError("allocation must be 2..15 bits")
    need_bytes = (32 + 32 * 4 + 32 * 6 + 12 * 32 * nb + 7) // 8
    if kbps is None:
        fits = [
            b for b in _L1_BITRATES[1:]
            if (12 * b * 1000) // rate * 4 >= need_bytes
        ]
        if not fits:
            raise ValueError(f"nb={nb} needs more than 448 kbps at {rate} Hz")
        kbps = fits[0]
    frame_len = (12 * kbps * 1000) // rate * 4  # no padding-bit frames
    if frame_len < need_bytes:
        raise ValueError(
            f"{kbps} kbps Layer I frame is {frame_len} B; "
            f"nb={nb} needs {need_bytes} B"
        )
    ana, _ = _matrices()
    x = np.asarray(samples, dtype=np.float64)
    out = bytearray()
    sb = _analyze_with(ana, x)  # (32, granules)
    n_frames = sb.shape[1] // 12
    for fr in range(n_frames):
        g = sb[:, fr * 12 : (fr + 1) * 12]  # (32, 12)
        w = _BitWriter()
        # header: sync, MPEG-1, Layer I, no CRC, bitrate, rate, mono
        w.write(0x7FF, 11)
        w.write(0b11, 2)           # version: MPEG-1
        w.write(0b11, 2)           # layer bits 11 = Layer I
        w.write(1, 1)              # protection off (no CRC)
        w.write(_L1_BITRATES.index(kbps), 4)
        w.write(_L1_RATES[rate], 2)
        w.write(0, 1)              # padding
        w.write(0, 1)              # private
        w.write(0b11, 2)           # mode: mono
        w.write(0, 2)              # mode extension
        w.write(0, 4)              # copyright/original/emphasis
        alloc = nb - 1             # Layer I: alloc code = nb - 1 (0 = none)
        for _k in range(N_BANDS):
            w.write(alloc, 4)
        sf_idx = np.empty(N_BANDS, dtype=int)
        for k in range(N_BANDS):
            peak = np.max(np.abs(g[k]))
            # smallest scalefactor >= peak (table is descending)
            cand = np.nonzero(_SCALEFACTORS >= max(peak, 1e-9))[0]
            sf_idx[k] = cand[-1] if len(cand) else 0
            w.write(int(sf_idx[k]), 6)
        lv = float(1 << nb)
        for m in range(12):
            for k in range(N_BANDS):
                sp = g[k, m] / _SCALEFACTORS[sf_idx[k]]  # in [-1, 1]
                # inverse of s'' = lv/(lv-1) * (s''' + 2/lv):
                frac = sp * (lv - 1.0) / lv - 2.0 / lv  # s''' in [-1, 1)
                code = int(round((frac + 1.0) * lv / 2.0))
                w.write(min(max(code, 0), (1 << nb) - 1), nb)
        out.extend(w.tobytes(pad_to=frame_len))
    return bytes(out)


def decode_layer1(blob: bytes) -> "tuple[int, np.ndarray] | None":
    """Decode an MPEG-1 Layer I stream to (sample_rate, mono float64
    samples). Stereo/dual streams decode the average of channels'
    subband samples (feature extraction wants one waveform). Returns
    None if the blob is not coherent Layer I. Layers II/III raise —
    see the module docstring for why their sample decode is stubbed."""
    from crux_spark.operators.multimodal import parse_mp3

    meta = parse_mp3(blob)
    if meta is None:
        return None
    if meta["layer"] != 1:
        raise NotImplementedError(
            f"Layer {meta['layer']} SAMPLE decode is stubbed: its "
            "bit-allocation tables (ISO 11172-3 Table B.2/Layer III "
            "huffman) are numeric spec tables with no closed form; "
            "re-deriving them blind would silently corrupt output. "
            "Metadata decode (parse_mp3) covers cataloging."
        )
    if meta["version"] != "1":
        return None
    i = 0
    if blob[:3] == b"ID3" and len(blob) >= 10:
        sz = ((blob[6] & 0x7F) << 21 | (blob[7] & 0x7F) << 14
              | (blob[8] & 0x7F) << 7 | (blob[9] & 0x7F))
        i = 10 + sz
    rate = meta["sample_rate"]
    stereo = meta["mode"] != "mono"
    nch = 2 if stereo else 1
    granules: list[np.ndarray] = []
    while i + 4 <= len(blob):
        if not (blob[i] == 0xFF and (blob[i + 1] & 0xE0) == 0xE0):
            i += 1
            continue
        h1, h2 = blob[i + 1], blob[i + 2]
        if ((h1 >> 1) & 0x3) != 0b11:  # layer I only
            break
        kbps = _MP3_L1_KBPS[(h2 >> 4) & 0xF]
        padding = (h2 >> 1) & 0x1
        protected = not (h1 & 0x1)
        flen = (12 * kbps * 1000 // rate + padding) * 4
        r = _BitReader(blob[i + 4 + (2 if protected else 0) : i + flen])
        # mode could differ per frame in degenerate streams; trust frame 1
        alloc = np.array(
            [[r.read(4) for _ in range(N_BANDS)] for _ in range(nch)]
        )
        nbits = np.where(alloc > 0, alloc + 1, 0)
        sf = np.zeros((nch, N_BANDS))
        for c in range(nch):
            for k in range(N_BANDS):
                if alloc[c, k]:
                    sf[c, k] = _SCALEFACTORS[min(r.read(6), 62)]
        g = np.zeros((nch, N_BANDS, 12))
        for m in range(12):
            for k in range(N_BANDS):
                for c in range(nch):
                    nb = int(nbits[c, k])
                    if not nb:
                        continue
                    lv = float(1 << nb)
                    code = r.read(nb)
                    frac = code * 2.0 / lv - 1.0          # s'''
                    s2 = lv / (lv - 1.0) * (frac + 2.0 / lv)  # s''
                    g[c, k, m] = s2 * sf[c, k]
        granules.append(g.mean(axis=0))  # downmix
        i += flen
    if not granules:
        return None
    _, syn = _matrices()
    sb = np.concatenate(granules, axis=1)
    x = _synthesize_with(syn, sb)
    # trim the analysis+synthesis cascade's group delay (TAPS samples)
    return rate, x[TAPS : TAPS + sb.shape[1] * _SHIFT]


_MP3_L1_KBPS = [0, 32, 64, 96, 128, 160, 192, 224,
                256, 288, 320, 352, 384, 416, 448]
