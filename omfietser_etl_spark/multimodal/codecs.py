"""Pure-numpy media codecs: real decode for the formats that need no
codec library — binary PPM (P6) and uncompressed 24-bit BMP images
(plus nearest-neighbor resize), RIFF/WAVE PCM-16 audio, and the
RIFF/AVI video container header.

This closes the "codec-absent" gap within the container's means: each
decode path is REAL (header parse, buffer reinterpret, exact stats /
resampling), not a metadata echo. Compressed formats (PNG/JPEG,
MP3/AAC, actual video frames) still need PIL/libvips/ffmpeg and
surface as 'unsupported' rows upstream; swapping those libs in later
only changes the closure bodies.

Everything is exposed through factory functions
(:func:`make_image_tools`, :func:`make_audio_tools`,
:func:`make_video_tools`) whose returned closures are
RUNTIME-CREATED — cloudpickle serializes them by value, so Spark
Python workers never need this package on their import path (the same
discipline as the x2 inference loader and the td5 block kernel).
"""

from __future__ import annotations


def make_image_tools():
    """Return (decode, to_array, resize, encode_ppm) pure closures.

    decode(data: bytes|None) -> dict | None with keys
        width, height, mode, mean_r, mean_g, mean_b
        (mode 'RGB'; None for unsupported/corrupt/empty input)
    to_array(data) -> HxWx3 uint8 RGB array | None
    resize(arr, out_w, out_h) -> HxWx3 uint8 nearest-neighbor resample
    encode_ppm(arr) -> binary P6 bytes (round-trip / re-encode)
    """
    import numpy as np

    def _parse_ppm(data):
        # P6\n<w> <h>\n<maxval>\n<raw RGB rows>; whitespace-tolerant
        # header, # comments allowed per spec.
        if not data.startswith(b"P6"):
            return None
        fields, i, n = [], 2, len(data)
        while len(fields) < 3 and i < n:
            while i < n and data[i : i + 1].isspace():
                i += 1
            if data[i : i + 1] == b"#":  # comment to EOL
                while i < n and data[i : i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < n and not data[j : j + 1].isspace():
                j += 1
            fields.append(data[i:j])
            i = j
        if len(fields) < 3:
            return None
        try:
            w, h, maxval = int(fields[0]), int(fields[1]), int(fields[2])
        except ValueError:
            return None
        if w <= 0 or h <= 0 or maxval != 255:
            return None
        i += 1  # single whitespace byte after maxval
        pix = data[i : i + w * h * 3]
        if len(pix) < w * h * 3:
            return None
        return np.frombuffer(pix, dtype=np.uint8).reshape(h, w, 3)

    def _parse_bmp(data):
        # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40), 24bpp BI_RGB,
        # bottom-up rows padded to 4 bytes, BGR byte order.
        if len(data) < 54 or data[:2] != b"BM":
            return None
        offset = int.from_bytes(data[10:14], "little")
        header_size = int.from_bytes(data[14:18], "little")
        if header_size < 40:
            return None
        w = int.from_bytes(data[18:22], "little", signed=True)
        h = int.from_bytes(data[22:26], "little", signed=True)
        bpp = int.from_bytes(data[28:30], "little")
        compression = int.from_bytes(data[30:34], "little")
        if w <= 0 or h == 0 or bpp != 24 or compression != 0:
            return None
        flipped = h > 0
        h = abs(h)
        row = (w * 3 + 3) // 4 * 4
        if len(data) < offset + row * h:
            return None
        buf = np.frombuffer(data[offset : offset + row * h], dtype=np.uint8)
        arr = buf.reshape(h, row)[:, : w * 3].reshape(h, w, 3)
        if flipped:
            arr = arr[::-1]
        return arr[:, :, ::-1]  # BGR → RGB

    def to_array(data):
        if not data:
            return None
        raw = bytes(data)
        arr = _parse_ppm(raw)
        if arr is None:
            arr = _parse_bmp(raw)
        return arr

    def decode(data):
        arr = to_array(data)
        if arr is None:
            return None
        means = arr.reshape(-1, 3).mean(axis=0)
        return {
            "width": int(arr.shape[1]),
            "height": int(arr.shape[0]),
            "mode": "RGB",
            "mean_r": float(means[0]),
            "mean_g": float(means[1]),
            "mean_b": float(means[2]),
        }

    def resize(arr, out_w, out_h):
        h, w = arr.shape[:2]
        ys = (np.arange(out_h) * h) // out_h
        xs = (np.arange(out_w) * w) // out_w
        return arr[ys][:, xs]

    def encode_ppm(arr):
        h, w = arr.shape[:2]
        return f"P6\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()

    return decode, to_array, resize, encode_ppm


def make_audio_tools():
    """Return (decode_wav, encode_wav) pure closures (by-value
    pickling, same discipline as make_image_tools).

    decode_wav(data) -> dict | None with keys
        n_channels, sample_rate, n_samples, duration_ms,
        sum_sq (exact int sum of squared samples), peak (max |s|)
    Supports RIFF/WAVE, PCM (format 1), 16-bit. Compressed audio
    (MP3/AAC/FLAC) needs real codec libs → None.
    encode_wav(samples, sample_rate) -> mono 16-bit PCM WAV bytes.
    """
    import numpy as np

    def decode_wav(data):
        if not data:
            return None
        raw = bytes(data)
        if len(raw) < 44 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
            return None
        pos, fmt, pcm = 12, None, None
        while pos + 8 <= len(raw):
            cid = raw[pos : pos + 4]
            size = int.from_bytes(raw[pos + 4 : pos + 8], "little")
            body = raw[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                pcm = body
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None or pcm is None or len(fmt) < 16:
            return None
        audio_format = int.from_bytes(fmt[0:2], "little")
        n_channels = int.from_bytes(fmt[2:4], "little")
        sample_rate = int.from_bytes(fmt[4:8], "little")
        bits = int.from_bytes(fmt[14:16], "little")
        if audio_format != 1 or bits != 16 or n_channels < 1 or sample_rate <= 0:
            return None
        samples = np.frombuffer(pcm[: len(pcm) // 2 * 2], dtype="<i2")
        n = len(samples) // n_channels
        return {
            "n_channels": n_channels,
            "sample_rate": sample_rate,
            "n_samples": int(n),
            "duration_ms": int(n * 1000 // sample_rate),
            "sum_sq": int((samples.astype(np.int64) ** 2).sum()),
            "peak": int(np.abs(samples.astype(np.int64)).max()) if len(samples) else 0,
            # raw interleaved int16 stream — fingerprinting needs the
            # samples themselves, not just the aggregate stats
            "samples": samples.astype(np.int64),
        }

    def encode_wav(samples, sample_rate):
        import numpy as np  # noqa: F811 — re-import inside closure scope

        pcm = np.asarray(samples, dtype="<i2").tobytes()
        hdr = (
            b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + sample_rate.to_bytes(4, "little")
            + (sample_rate * 2).to_bytes(4, "little")
            + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
            + b"data" + len(pcm).to_bytes(4, "little")
        )
        return hdr + pcm

    return decode_wav, encode_wav


def make_video_tools():
    """Return (probe_avi, encode_avi) pure closures (by-value
    pickling, same discipline as the image/audio factories).

    probe_avi(data) -> dict | None with keys
        n_streams, width, height, n_frames, us_per_frame, duration_ms
    Walks RIFF/'AVI ' nested LIST chunks to the 'avih' main header —
    real container metadata, no frame decode (frame pixels need real
    video codecs). encode_avi(w, h, n_frames, us_per_frame) builds the
    minimal header-only AVI the tests and the mm6 gate round-trip.
    """

    def _find_avih(raw, pos, end):
        while pos + 8 <= end:
            cid = raw[pos : pos + 4]
            size = int.from_bytes(raw[pos + 4 : pos + 8], "little")
            body_start = pos + 8
            if cid == b"LIST":
                found = _find_avih(raw, body_start + 4, body_start + size)
                if found is not None:
                    return found
            elif cid == b"avih" and size >= 40:
                return raw[body_start : body_start + size]
            pos = body_start + size + (size & 1)
        return None

    def probe_avi(data):
        if not data:
            return None
        raw = bytes(data)
        if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
            return None
        avih = _find_avih(raw, 12, len(raw))
        if avih is None:
            return None
        uspf = int.from_bytes(avih[0:4], "little")
        n_frames = int.from_bytes(avih[16:20], "little")
        n_streams = int.from_bytes(avih[24:28], "little")
        width = int.from_bytes(avih[32:36], "little")
        height = int.from_bytes(avih[36:40], "little")
        return {
            "n_streams": n_streams,
            "width": width,
            "height": height,
            "n_frames": n_frames,
            "us_per_frame": uspf,
            "duration_ms": n_frames * uspf // 1000,
        }

    def encode_avi(width, height, n_frames, us_per_frame):
        avih = (
            us_per_frame.to_bytes(4, "little")
            + (0).to_bytes(12, "little")
            + n_frames.to_bytes(4, "little")
            + (0).to_bytes(4, "little")
            + (1).to_bytes(4, "little")
            + (0).to_bytes(4, "little")
            + width.to_bytes(4, "little")
            + height.to_bytes(4, "little")
            + b"\x00" * 16
        )
        hdrl = b"hdrl" + b"avih" + len(avih).to_bytes(4, "little") + avih
        lst = b"LIST" + len(hdrl).to_bytes(4, "little") + hdrl
        body = b"AVI " + lst
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    return probe_avi, encode_avi


def make_video_frame_tools():
    """Return (decode_avi_frames, avi_frames_prefix) pure closures
    (by-value pickling, same discipline as the other factories) for
    AVIs that CARRY uncompressed frame chunks — the frame-level
    complement to make_video_tools' header-only probe.

    decode_avi_frames(data) -> list[int] | None: walks RIFF/'AVI '
    to the 'movi' LIST and returns the exact integer mean luma
    (sum of frame bytes div byte count) of every uncompressed '00db'
    chunk, in stream order. Raw DIB frames need no codec — this is a
    REAL container+frame parse, not a stub.

    avi_frames_prefix(w, h, n_frames, frame_bytes) -> bytes: the
    container prefix up to the first frame chunk, with RIFF/LIST
    sizes precomputed for n_frames fixed-size frames (callers append
    the '00db' chunks; probe_avi reads the same header).
    """

    def _walk_movi(raw, pos, end):
        while pos + 8 <= end:
            cid = raw[pos : pos + 4]
            size = int.from_bytes(raw[pos + 4 : pos + 8], "little")
            body = pos + 8
            if cid == b"LIST":
                if raw[body : body + 4] == b"movi":
                    return (body + 4, body + size)
                found = _walk_movi(raw, body + 4, body + size)
                if found is not None:
                    return found
            pos = body + size + (size & 1)
        return None

    def decode_avi_frames(data):
        if not data:
            return None
        raw = bytes(data)
        if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
            return None
        span = _walk_movi(raw, 12, len(raw))
        if span is None:
            return None
        pos, end = span
        lumas = []
        while pos + 8 <= end:
            cid = raw[pos : pos + 4]
            size = int.from_bytes(raw[pos + 4 : pos + 8], "little")
            body = pos + 8
            if cid == b"00db" and size > 0:
                chunk = raw[body : body + size]
                lumas.append(sum(chunk) // len(chunk))
            pos = body + size + (size & 1)
        return lumas

    def avi_frames_prefix(width, height, n_frames, frame_bytes):
        us_per_frame = 40000
        avih = (
            us_per_frame.to_bytes(4, "little")
            + (0).to_bytes(12, "little")
            + n_frames.to_bytes(4, "little")
            + (0).to_bytes(4, "little")
            + (1).to_bytes(4, "little")
            + (0).to_bytes(4, "little")
            + width.to_bytes(4, "little")
            + height.to_bytes(4, "little")
            + b"\x00" * 16
        )
        hdrl = b"hdrl" + b"avih" + len(avih).to_bytes(4, "little") + avih
        lst = b"LIST" + len(hdrl).to_bytes(4, "little") + hdrl
        movi_size = 4 + n_frames * (8 + frame_bytes)
        body_len = 4 + len(lst) + 8 + movi_size
        return (
            b"RIFF" + body_len.to_bytes(4, "little") + b"AVI " + lst
            + b"LIST" + movi_size.to_bytes(4, "little") + b"movi"
        )

    return decode_avi_frames, avi_frames_prefix
