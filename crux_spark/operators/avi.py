"""AVI (RIFF) container walk + MJPEG video frames — pure stdlib/numpy.

Closes the "video decode is stubbed" gap for the one video format this
container can decode END-TO-END: Motion-JPEG in an AVI wrapper, where
every frame is a baseline JPEG our pure-numpy decoder
(operators/jpeg.py) already handles. Container layout from the PUBLIC
Microsoft RIFF/AVI specification (widely documented):

    RIFF 'AVI '
      LIST 'hdrl'
        'avih' MainAVIHeader  (dwMicroSecPerFrame, dwTotalFrames,
                               dwWidth, dwHeight, ...)
        LIST 'strl'
          'strh' AVIStreamHeader (fccType 'vids', fccHandler 'MJPG',
                                  dwScale, dwRate)
          'strf' BITMAPINFOHEADER
      LIST 'movi'
        '00dc' compressed frame chunks (JPEG bytes for MJPG)
      'idx1' (optional index — not required for a sequential walk)

Fixtures come from encode_avi_mjpeg (frames encoded with our own
Annex-K JPEG encoder), so parse -> frame-extract -> JPEG-decode is
verified on real pixels in-sandbox. Other codecs (H.264/MPEG-4 etc.)
need entropy/transform machinery with large numeric spec tables and
stay stubbed — same policy as MPEG audio Layer II/III
(mpeg_audio.py docstring).
"""

from __future__ import annotations

import struct


def _chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking sibling RIFF
    chunks in data[start:end]; chunk data is padded to even sizes."""
    i = start
    while i + 8 <= end:
        fourcc = data[i : i + 4]
        (size,) = struct.unpack_from("<I", data, i + 4)
        yield fourcc, i + 8, size
        i += 8 + size + (size & 1)


def parse_avi(blob: bytes) -> "dict | None":
    """AVI metadata: {width, height, n_frames, fps, duration_ms, codec}
    or None if not a RIFF/AVI blob."""
    if blob is None or len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        return None
    meta: dict = {}
    for cc, off, size in _chunks(blob, 12, len(blob)):
        if cc != b"LIST" or blob[off : off + 4] != b"hdrl":
            continue
        for cc2, off2, size2 in _chunks(blob, off + 4, off + size):
            if cc2 == b"avih" and size2 >= 32:
                us_per_frame, _, _, _, total, _, _, _ = struct.unpack_from(
                    "<8I", blob, off2
                )
                w, h = struct.unpack_from("<2I", blob, off2 + 32)
                meta.update(
                    width=int(w),
                    height=int(h),
                    n_frames=int(total),
                    fps=round(1e6 / us_per_frame, 3) if us_per_frame else None,
                    duration_ms=int(total * us_per_frame / 1000)
                    if us_per_frame
                    else None,
                )
            elif cc2 == b"LIST" and blob[off2 : off2 + 4] == b"strl":
                for cc3, off3, size3 in _chunks(blob, off2 + 4, off2 + size2):
                    if cc3 == b"strh" and size3 >= 8:
                        if blob[off3 : off3 + 4] == b"vids":
                            meta["codec"] = (
                                blob[off3 + 4 : off3 + 8].decode("ascii", "replace").strip()
                            )
    return meta or None


def avi_frames(blob: bytes) -> "list[bytes]":
    """The movi-list video frame chunks ('00dc'/'00db' of stream 0) in
    order. For an MJPG stream each element is a standalone JPEG."""
    if blob is None or len(blob) < 12 or blob[:4] != b"RIFF":
        return []
    out: list[bytes] = []
    for cc, off, size in _chunks(blob, 12, len(blob)):
        if cc == b"LIST" and blob[off : off + 4] == b"movi":
            for cc2, off2, size2 in _chunks(blob, off + 4, off + size):
                if cc2 in (b"00dc", b"00db"):
                    out.append(bytes(blob[off2 : off2 + size2]))
    return out


def decode_avi_frame(blob: bytes, ts_ms: int) -> "bytes | None":
    """The JPEG bytes of the frame covering ``ts_ms`` (sequential-walk
    frame selection by fps), or None for non-AVI / non-MJPG input."""
    meta = parse_avi(blob)
    if not meta or meta.get("codec") != "MJPG" or not meta.get("fps"):
        return None
    frames = avi_frames(blob)
    if not frames:
        return None
    idx = min(int(ts_ms * meta["fps"] / 1000.0), len(frames) - 1)
    return frames[idx]


def encode_avi_mjpeg(frames_rgb, fps: int = 10) -> bytes:
    """Minimal spec-layout MJPG AVI writer (fixture/test path): each RGB
    frame (numpy HxWx3 uint8) is encoded with the in-repo baseline JPEG
    encoder and wrapped in RIFF/hdrl/movi chunks that parse_avi and any
    AVI reader walk."""
    import numpy as np

    from crux_spark.operators.jpeg import encode_jpeg

    frames_rgb = [np.asarray(f, dtype=np.uint8) for f in frames_rgb]
    if not frames_rgb:
        raise ValueError("need at least one frame")
    h, w = frames_rgb[0].shape[:2]
    jpegs = [encode_jpeg(f) for f in frames_rgb]

    def chunk(cc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return cc + struct.pack("<I", len(payload)) + payload + pad

    def list_chunk(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    us_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<14I",
        us_per_frame, 0, 0, 0x10, len(jpegs), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    # AVIStreamHeader after the two fourccs: dwFlags, wPriority,
    # wLanguage, dwInitialFrames, dwScale, dwRate, dwStart, dwLength,
    # dwSuggestedBufferSize, dwQuality, dwSampleSize, rcFrame(4xWORD)
    strh = b"vids" + b"MJPG" + struct.pack(
        "<I2H8I4H",
        0, 0, 0, 0, 1, fps, 0, len(jpegs), 0, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack("<I2i2H2I2i2I", 40, w, h, 1, 24, 0, w * h * 3, 0, 0, 0, 0)
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = list_chunk(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
