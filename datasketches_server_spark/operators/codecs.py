"""Pure-numpy codecs for UNCOMPRESSED public media formats.

Real decode kernels for the multimodal pipeline (`operators/multimodal.py`):
PIL/ffmpeg are absent from this sandbox, but the uncompressed formats need
no external library -- their byte layouts are public specs and the decode
math is plain numpy:

  - PPM (P6) / PGM (P5): netpbm binary images (maxval <= 255)
  - BMP: Windows bitmap, 24-bit BI_RGB uncompressed, bottom-up rows
  - WAV: RIFF PCM, 16-bit signed little-endian, mono or interleaved
  - Y4M: YUV4MPEG2 raw video, C444 planar frames (BT.601 YUV <-> RGB)

Compressed formats (JPEG/PNG/MP3/MP4) genuinely require external codec
libraries and remain behind the documented md5 stand-in in multimodal.py.

Encoders exist so tests and the synthetic media generator can build real
payloads deterministically; every decoder round-trips its encoder
bit-exactly (Y4M round-trips in YUV space exactly, in RGB space within
+-2/255 from the 8-bit BT.601 matrix quantization).

No reference analog -- the reference (apache/datasketches-server) has no
media path; this implements the task brief's multimodal requirement.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- netpbm


def encode_ppm(img: np.ndarray) -> bytes:
    """P6 (HxWx3 uint8) or P5 (HxW uint8) binary netpbm."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    elif img.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"expected HxWx3 or HxW uint8, got shape {img.shape}")
    h, w = img.shape[:2]
    return b"%s\n%d %d\n255\n" % (magic, w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Parse binary netpbm: P6 -> HxWx3 uint8, P5 -> HxW uint8.

    Honors the spec's whitespace/comment rules in the header (tokens
    separated by whitespace; '#' starts a comment through end-of-line);
    pixel data begins after the single whitespace byte that terminates
    the maxval token."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload (want P5/P6 magic)")
    magic = payload[:2]
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        # skip whitespace and comments
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            nl = payload.index(b"\n", pos)
            pos = nl + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated netpbm header")
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return raster.reshape(h, w, 3) if ch == 3 else raster.reshape(h, w)


# ----------------------------------------------------------------- BMP

_BMP_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res, res, data offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit BI_RGB bottom-up BMP from an HxWx3 uint8 RGB array."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got shape {img.shape}")
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    offset = _BMP_FILE_HDR.size + _BMP_INFO_HDR.size
    file_hdr = _BMP_FILE_HDR.pack(b"BM", offset + len(data), 0, 0, offset)
    info_hdr = _BMP_INFO_HDR.pack(
        _BMP_INFO_HDR.size, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """Parse a 24-bit uncompressed BMP -> HxWx3 uint8 RGB.

    Handles both bottom-up (positive height, the common case) and
    top-down (negative height) row orders and the 4-byte row padding."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, offset = _BMP_FILE_HDR.unpack_from(payload, 0)
    (hdr_size, w, h, _planes, bpp, compression, *_rest) = _BMP_INFO_HDR.unpack_from(
        payload, _BMP_FILE_HDR.size
    )
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    raster = np.frombuffer(payload, dtype=np.uint8, count=h * row_bytes, offset=offset)
    rows = raster.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    return np.ascontiguousarray(rgb if top_down else rgb[::-1])


# ----------------------------------------------------------------- WAV

_RIFF_HDR = struct.Struct("<4sI4s")
_FMT_PCM16 = struct.Struct("<HHIIHH")


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """RIFF/WAVE PCM16 from int16 samples: (n,) mono or (n, ch) interleaved."""
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    data = samples.tobytes()
    fmt = _FMT_PCM16.pack(1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (
        b"WAVEfmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse RIFF/WAVE PCM16 -> (samples int16 [(n,) or (n, ch)], rate).

    Walks the RIFF chunk list (fmt / data may be separated by other
    chunks; chunk bodies pad to even length per the spec)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, ch, data = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, ch, rate, _, _, bits = _FMT_PCM16.unpack_from(body, 0)
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM16 supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    if ch > 1:
        samples = samples.reshape(-1, ch)
    return samples, rate


# ----------------------------------------------------------------- Y4M

# BT.601 full-range RGB <-> YUV (the JPEG/JFIF matrix), 8-bit.
_RGB2YUV = np.array(
    [[0.299, 0.587, 0.114], [-0.168736, -0.331264, 0.5], [0.5, -0.418688, -0.081312]]
)
_YUV2RGB = np.array([[1.0, 0.0, 1.402], [1.0, -0.344136, -0.714136], [1.0, 1.772, 0.0]])


def rgb_to_yuv(rgb: np.ndarray) -> np.ndarray:
    yuv = rgb.astype(np.float64) @ _RGB2YUV.T
    yuv[..., 1:] += 128.0
    return np.clip(np.rint(yuv), 0, 255).astype(np.uint8)


def yuv_to_rgb(yuv: np.ndarray) -> np.ndarray:
    f = yuv.astype(np.float64)
    f[..., 1:] -= 128.0
    rgb = f @ _YUV2RGB.T
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def encode_y4m(frames: np.ndarray, fps: int = 25, space: str = "rgb") -> bytes:
    """YUV4MPEG2 C444 from frames (n, h, w, 3) uint8.

    space='rgb' converts through BT.601; space='yuv' stores the planes
    as given (bit-exact round-trip)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f"expected (n,h,w,3) uint8, got {frames.shape}")
    n, h, w, _ = frames.shape
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, fps)]
    for i in range(n):
        yuv = rgb_to_yuv(frames[i]) if space == "rgb" else frames[i]
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(yuv.transpose(2, 0, 1)).tobytes())  # planar
    return b"".join(out)


def parse_y4m_header(payload: bytes) -> tuple[int, int, int, int]:
    """-> (width, height, fps_num, body_offset). C444 only."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    fps = 25
    for tok in payload[9:nl].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = tok[1:].split(b":")
            fps = max(1, int(num) // max(1, int(den)))
        elif tok[:1] == b"C" and tok != b"C444":
            raise ValueError(f"only C444 supported, got {tok!r}")
    if w is None or h is None:
        raise ValueError("missing W/H in Y4M header")
    return w, h, fps, nl + 1


def y4m_frame_count(payload: bytes) -> int:
    w, h, _, off = parse_y4m_header(payload)
    stride = 6 + w * h * 3  # b"FRAME\n" + planes
    return (len(payload) - off) // stride


def decode_y4m_frame(payload: bytes, index: int, space: str = "rgb") -> np.ndarray:
    """Decode ONE frame by index -> (h, w, 3) uint8.  Random access is a
    byte-offset computation -- sampling k frames of an n-frame video
    reads k planes, never the whole raster."""
    w, h, _, off = parse_y4m_header(payload)
    stride = 6 + w * h * 3
    start = off + index * stride
    if payload[start : start + 6] != b"FRAME\n":
        raise ValueError(f"bad FRAME marker at frame {index}")
    planes = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=start + 6)
    yuv = planes.reshape(3, h, w).transpose(1, 2, 0)
    return yuv_to_rgb(yuv) if space == "rgb" else np.ascontiguousarray(yuv)


# ------------------------------------------------------------- kernels


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (HxW or HxWxC), pixel-center sampling."""
    h, w = img.shape[:2]
    rows = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return img[rows][:, cols]


def to_gray(rgb: np.ndarray) -> np.ndarray:
    """BT.601 luma (uint8) of an HxWx3 uint8 image."""
    return rgb_to_yuv(rgb)[..., 0]


def image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Real image features in [0,1]: an sxs nearest-neighbor grayscale
    thumbnail (s = floor(sqrt(dim))) flattened, padded with per-channel
    means and stds to exactly `dim` floats."""
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    s = max(1, int(np.sqrt(dim)))
    thumb = resize_nearest(to_gray(img), s, s).astype(np.float32) / 255.0
    flat = img.reshape(-1, 3).astype(np.float32) / 255.0
    stats = np.concatenate([flat.mean(axis=0), flat.std(axis=0)])
    feats = np.concatenate([thumb.ravel(), np.tile(stats, dim // 6 + 1)])
    return feats[:dim].astype(np.float32)


def audio_features(samples: np.ndarray, dim: int) -> np.ndarray:
    """Real audio features in [0,1]: per-window RMS over `dim` equal
    windows of the mono-mixed signal (int16 scale normalized)."""
    mono = samples.astype(np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    n = len(mono)
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    edges = (np.arange(dim + 1) * n) // dim
    sq = np.concatenate([[0.0], np.cumsum(mono * mono)])
    counts = np.maximum(edges[1:] - edges[:-1], 1)
    rms = np.sqrt((sq[edges[1:]] - sq[edges[:-1]]) / counts) / 32768.0
    return rms.astype(np.float32)


def video_features(payload: bytes, dim: int, max_frames: int = 8) -> np.ndarray:
    """Real video features: sample <= max_frames frames evenly (random
    access, never the full raster), take each frame's image_features,
    average across frames."""
    n = y4m_frame_count(payload)
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    k = min(n, max_frames)
    idx = np.unique(((np.arange(k) + 0.5) * n / k).astype(np.int64))
    acc = np.zeros(dim, dtype=np.float64)
    for i in idx:
        acc += image_features(decode_y4m_frame(payload, int(i)), dim)
    return (acc / len(idx)).astype(np.float32)
