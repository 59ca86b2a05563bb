"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

The decode boundary is REAL for three container formats, implemented
in pure numpy (no image/audio libraries in this environment): PPM
(P6, 8-bit) and PNG (8-bit gray/gray+alpha/RGB/RGBA, non-interlaced,
all five scanline filters, stdlib zlib inflate) images, and RIFF/WAVE
PCM16 audio. Remaining compressed formats (JPEG/WebP/MP3/...) would
slot into the same stage behind PIL/av and raise NotImplementedError
here; ``fake=True`` keeps the deterministic hash-seeded pseudo-decode
for plumbing tests.

Scale notes: binary payloads dominate block size; callers should lower
``batch_size`` (a 1 MB image × 1024-row batch = 1 GB per batch) and rely
on ``batch_format="pyarrow"`` (binary columns do not round-trip pandas
cleanly). Stages are actor pools because real decoders hold codecs /
models loaded once per actor.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_META_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("mime", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])


# ---------------------------------------------------------------------------
# pure-numpy codecs (uncompressed containers)
# ---------------------------------------------------------------------------

def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """P6 (binary, 8-bit) PPM → (width, height, HxWx3 uint8)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace separated with
    # optional '#' comment lines
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    need = w * h * 3
    pix = np.frombuffer(payload, np.uint8, count=need, offset=pos)
    return w, h, pix.reshape(h, w, 3)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 → P6 payload (test/synthesis twin of decode_ppm)."""
    h, w, c = pixels.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(pixels, np.uint8).tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, rgb, gray+a, rgba


def decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """PNG → (width, height, HxWxC uint8). Pure numpy + stdlib zlib:
    8-bit depth, color types gray/RGB/gray+alpha/RGBA, non-interlaced,
    all five scanline filters. Sub/Up are fully vectorized (per-channel
    cumsum / row add); Average and Paeth have a left-neighbour data
    dependency, so those rows fall back to a per-pixel-column loop —
    correct first, and real encoders mix filters per row so typical
    images stay mostly vectorized. Palette/16-bit/interlaced raise
    NotImplementedError (the PIL boundary)."""
    import struct
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = 8
    idat = []
    w = h = depth = ctype = None
    interlace = 0
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or interlace:
        raise NotImplementedError(
            "only 8-bit non-interlaced PNG decodes natively")
    ch = _PNG_CHANNELS.get(ctype)
    if ch is None:
        raise NotImplementedError("palette PNG requires PIL")
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    raw = raw.reshape(h, stride + 1)
    ftypes = raw[:, 0]
    out = np.zeros((h, stride), np.uint8)
    for y in range(h):
        f = int(ftypes[y])
        cur = raw[y, 1:]
        up = out[y - 1] if y else np.zeros(stride, np.uint8)
        if f == 0:                       # None
            out[y] = cur
        elif f == 1:                     # Sub: prefix sum per channel
            out[y] = (np.cumsum(cur.reshape(w, ch), axis=0,
                                dtype=np.uint64) & 0xFF
                      ).astype(np.uint8).reshape(stride)
        elif f == 2:                     # Up
            out[y] = cur + up            # uint8 wraps mod 256
        elif f == 3:                     # Average (left-dependent)
            row = out[y]
            row[:ch] = cur[:ch] + (up[:ch] >> 1)
            for x in range(ch, stride, ch):
                row[x:x + ch] = cur[x:x + ch] + (
                    (row[x - ch:x].astype(np.uint16) +
                     up[x:x + ch]) >> 1).astype(np.uint8)
        elif f == 4:                     # Paeth (left-dependent)
            row = out[y]
            row[:ch] = cur[:ch] + up[:ch]  # left=c=0 -> predictor=up
            for x in range(ch, stride, ch):
                a = row[x - ch:x].astype(np.int16)
                b = up[x:x + ch].astype(np.int16)
                c = up[x - ch:x].astype(np.int16)
                p = a + b - c
                pa_ = np.abs(p - a)
                pb = np.abs(p - b)
                pc = np.abs(p - c)
                pred = np.where((pa_ <= pb) & (pa_ <= pc), a,
                                np.where(pb <= pc, b, c))
                row[x:x + ch] = cur[x:x + ch] + pred.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter {f}")
    return int(w), int(h), out.reshape(h, w, ch)


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """HxWxC uint8 → PNG payload (test/synthesis twin of decode_png).
    ``filter_type`` applies one filter to every scanline (0-4) so tests
    can exercise each decode branch; inversion vs decode_png is the
    correctness check."""
    import struct
    import zlib

    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    px = np.ascontiguousarray(pixels, np.uint8)
    stride = w * ch
    lines = []
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        rowv = px[y].reshape(stride)
        if filter_type == 0:
            filt = rowv
        elif filter_type == 1:
            shifted = np.zeros(stride, np.uint8)
            shifted[ch:] = rowv[:-ch]
            filt = rowv - shifted
        elif filter_type == 2:
            filt = rowv - prev
        elif filter_type == 3:
            left = np.zeros(stride, np.uint16)
            left[ch:] = rowv[:-ch]
            filt = rowv - ((left + prev) >> 1).astype(np.uint8)
        elif filter_type == 4:
            a = np.zeros(stride, np.int16)
            a[ch:] = rowv[:-ch]
            b = prev.astype(np.int16)
            c = np.zeros(stride, np.int16)
            c[ch:] = prev[:-ch]
            p = a + b - c
            pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where((pa_ <= pb) & (pa_ <= pc), a,
                            np.where(pb <= pc, b, c))
            filt = rowv - pred.astype(np.uint8)
        else:
            raise ValueError(filter_type)
        lines.append(bytes([filter_type]) + filt.tobytes())
        prev = rowv
    body = zlib.compress(b"".join(lines))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data +
                struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", body) +
            chunk(b"IEND", b""))


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 → (sample_rate, frames×channels int16)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = None
    channels = 1
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            if fmt != 1:
                raise NotImplementedError("only PCM WAV supported")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if bits != 16:
                raise NotImplementedError("only 16-bit PCM supported")
        elif cid == b"data":
            data = np.frombuffer(body, "<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, data.reshape(-1, channels)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """frames×channels int16 → RIFF/WAVE PCM payload."""
    if samples.ndim == 1:
        samples = samples[:, None]
    ch = samples.shape[1]
    body = np.ascontiguousarray(samples, "<i2").tobytes()
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
           + rate.to_bytes(4, "little")
           + (rate * ch * 2).to_bytes(4, "little")
           + (ch * 2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    data = b"data" + len(body).to_bytes(4, "little") + body
    riff_body = b"WAVE" + fmt + data
    return b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body


def _pool_grid(gray: np.ndarray, grid: int) -> np.ndarray:
    """Mean-pool a 2-D array onto a grid×grid feature map (float32)."""
    h, w = gray.shape
    ys = np.minimum((np.arange(h) * grid) // max(h, 1), grid - 1)
    xs = np.minimum((np.arange(w) * grid) // max(w, 1), grid - 1)
    cell = ys[:, None] * grid + xs[None, :]
    sums = np.bincount(cell.ravel(), weights=gray.ravel(),
                       minlength=grid * grid)
    cnts = np.maximum(np.bincount(cell.ravel(), minlength=grid * grid), 1)
    return (sums / cnts).astype(np.float32)


class DecodeImage:
    """binary payload → fixed-size float feature row.

    Real path: P6 PPM via the pure-numpy decoder; features are a
    grid-mean-pooled grayscale map (grid² == ``feat_dim``). Other
    formats raise NotImplementedError (they need PIL). ``fake=True``
    keeps the deterministic hash-seeded pseudo-decode.

    Output: media_id:int64, width:int32, height:int32,
    features:list<float> (dim ``feat_dim``).
    """

    def __init__(self, payload_col: str = "payload",
                 id_col: str = "media_id", feat_dim: int = 64,
                 fake: bool = False):
        self.payload_col = payload_col
        self.id_col = id_col
        self.feat_dim = feat_dim
        self.grid = int(np.sqrt(feat_dim))
        if self.grid * self.grid != feat_dim:
            raise ValueError("feat_dim must be a square (grid pooling)")
        self.fake = fake

    def _decode_real(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        if payload.startswith(b"P6"):
            w, h, pix = decode_ppm(payload)
        elif payload.startswith(_PNG_SIG):
            w, h, pix = decode_png(payload)
            if pix.shape[2] in (2, 4):   # drop alpha for the gray pool
                pix = pix[:, :, :-1]
        else:
            raise NotImplementedError(
                "only P6 PPM and 8-bit PNG decode natively; other image "
                "formats require PIL (not in this environment)")
        gray = pix.astype(np.float64).mean(axis=2) / 255.0
        return w, h, _pool_grid(gray, self.grid)

    def _decode_fake(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        """Deterministic pseudo-decode: dims + features from sha1(payload)."""
        digest = hashlib.sha1(payload).digest()
        w = 16 + digest[0] % 64
        h = 16 + digest[1] % 64
        seed = int.from_bytes(digest[2:10], "big")
        rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
        return w, h, rng.random(self.feat_dim, dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, feats = [], [], [], []
        payloads = batch[self.payload_col].to_pylist()
        mids = batch[self.id_col].to_pylist()
        for mid, p in zip(mids, payloads):
            if self.fake:
                w, h, f = self._decode_fake(p or b"")
            else:
                w, h, f = self._decode_real(p or b"")
            ids.append(mid)
            ws.append(w)
            hs.append(h)
            feats.append(np.asarray(f, np.float32).ravel())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
        })


class DecodeAudio:
    """WAV binary payload → per-clip features: sample_rate, n_frames,
    rms energy per fixed window (``n_windows`` of them, float32)."""

    def __init__(self, payload_col: str = "payload",
                 id_col: str = "media_id", n_windows: int = 16):
        self.payload_col = payload_col
        self.id_col = id_col
        self.n_windows = n_windows

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, rates, nframes, energies = [], [], [], []
        for mid, p in zip(batch[self.id_col].to_pylist(),
                          batch[self.payload_col].to_pylist()):
            rate, samples = decode_wav(p)
            mono = samples.astype(np.float64).mean(axis=1) / 32768.0
            n = len(mono)
            w = self.n_windows
            edges = (np.arange(w + 1) * n) // w
            rms = np.empty(w, np.float32)
            for i in range(w):
                seg = mono[edges[i]:edges[i + 1]]
                rms[i] = np.sqrt(np.mean(seg * seg)) if len(seg) else 0.0
            ids.append(mid)
            rates.append(rate)
            nframes.append(n)
            energies.append(rms)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "sample_rate": pa.array(rates, pa.int32()),
            "n_frames": pa.array(nframes, pa.int64()),
            "rms": pa.array([e.tolist() for e in energies],
                            pa.list_(pa.float32())),
        })


class FrameSample:
    """video binary → one row per sampled frame offset (metadata only;
    compressed video decode stays behind the same NotImplementedError
    boundary as non-PPM images)."""

    def __init__(self, payload_col: str = "payload",
                 id_col: str = "media_id", every_n_bytes: int = 1 << 16):
        self.payload_col = payload_col
        self.id_col = id_col
        self.every = every_n_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, offs = [], [], []
        for mid, p in zip(batch[self.id_col].to_pylist(),
                          batch[self.payload_col].to_pylist()):
            n = len(p or b"")
            k = max(1, n // self.every)
            for fi in range(k):
                ids.append(mid)
                frames.append(fi)
                offs.append(fi * self.every)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame": pa.array(frames, pa.int32()),
            "byte_offset": pa.array(offs, pa.int64()),
        })


def decode_images(ds, *, fake: bool = False, feat_dim: int = 64,
                  batch_size: int = 64, concurrency=None):
    """Actor-pool decode stage over a media dataset (small batches: binary
    payloads dominate memory). ``concurrency=None`` sizes the pool
    elastically to the cluster ((1, CPUs) — a fixed small cap starves
    the stage at scale); pass an int or (min, max) to pin it."""
    import ray
    if concurrency is None:
        concurrency = (1, max(1, int(ray.cluster_resources().get("CPU",
                                                                 8))))
    return ds.map_batches(DecodeImage,
                          fn_constructor_kwargs=dict(fake=fake,
                                                     feat_dim=feat_dim),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def synth_media_table(doc_ids: np.ndarray, *,
                      noise: bool = True) -> pa.Table:
    """Deterministic synthetic media table derived from doc ids: one
    small image per doc — even ids as P6 PPM, odd ids as PNG (cycling
    through the five scanline filters). Used by the driver media
    queries and tests — real container bytes through the real
    decoders.

    ``noise=True`` adds Philox noise to the gradient (plumbing tests).
    ``noise=False`` uses a CLOSED-FORM texture instead —
    ``pix(x,y,c) = min(x*255//(w-1) + y*131//(h-1) +
    (x*7 + y*11 + c*5 + did) % 32, 255)`` — integer arithmetic a SQL
    oracle can recompute analytically from doc_id alone, which makes
    the real decode path end-to-end hash-checkable (pipelines
    ``media_decode``)."""
    ids, mimes, payloads = [], [], []
    for did in np.asarray(doc_ids, np.int64).tolist():
        w = 24 + did % 17
        h = 20 + did % 13
        yy, xx = np.mgrid[0:h, 0:w]
        base = ((xx * 255) // max(w - 1, 1) + (yy * 131) // max(h - 1, 1))
        if noise:
            rng = np.random.Generator(np.random.Philox(key=[did, 0]))
            tex = rng.integers(0, 32, (h, w, 3), dtype=np.int64)
        else:
            cc = np.arange(3, dtype=np.int64)
            tex = (xx[:, :, None] * 7 + yy[:, :, None] * 11
                   + cc[None, None, :] * 5 + did) % 32
        pix = np.clip(base[:, :, None] + tex, 0, 255).astype(np.uint8)
        ids.append(did)
        if did % 2:
            mimes.append("image/png")
            payloads.append(encode_png(pix, filter_type=(did // 2) % 5))
        else:
            mimes.append("image/x-portable-pixmap")
            payloads.append(encode_ppm(pix))
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "mime": pa.array(mimes, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
    })


def synth_audio_table(doc_ids: np.ndarray) -> pa.Table:
    """Deterministic synthetic WAV table with CLOSED-FORM samples:
    mono PCM16, ``n = 2048 + (did % 5) * 17`` frames at 16 kHz,
    ``sample[i] = ((did*31 + i*7) % 65536) - 32768`` — real RIFF/WAVE
    bytes whose decoded integer checksum a SQL oracle can recompute
    from doc_id alone (pipelines ``media_audio``)."""
    ids, payloads = [], []
    for did in np.asarray(doc_ids, np.int64).tolist():
        n = 2048 + (did % 5) * 17
        i = np.arange(n, dtype=np.int64)
        samples = ((did * 31 + i * 7) % 65536 - 32768).astype(np.int16)
        ids.append(did)
        payloads.append(encode_wav(samples, rate=16000))
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "mime": pa.array(["audio/wav"] * len(ids), pa.string()),
        "payload": pa.array(payloads, pa.binary()),
    })


class ImageChecksum:
    """binary image payload → (media_id, width, height, pix_sum):
    the REAL decode (P6 PPM / PNG) reduced to an exact int64 pixel sum
    — the oracle-comparable fingerprint of the decoded raster (any
    decoder defect shifts the sum). Actor-pool stage like DecodeImage."""

    def __init__(self, payload_col: str = "payload",
                 id_col: str = "media_id"):
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, sums = [], [], [], []
        for mid, p in zip(batch[self.id_col].to_pylist(),
                          batch[self.payload_col].to_pylist()):
            p = p or b""
            if p.startswith(b"P6"):
                w, h, pix = decode_ppm(p)
            elif p.startswith(_PNG_SIG):
                w, h, pix = decode_png(p)
            else:
                raise NotImplementedError(
                    "only P6 PPM and 8-bit PNG decode natively")
            ids.append(mid)
            ws.append(w)
            hs.append(h)
            sums.append(int(pix.astype(np.int64).sum()))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "pix_sum": pa.array(sums, pa.int64()),
        })


class AudioChecksum:
    """binary WAV payload → (media_id, sample_rate, n_frames,
    sample_sum): the real PCM16 decode reduced to an exact int64
    sample sum (oracle-comparable)."""

    def __init__(self, payload_col: str = "payload",
                 id_col: str = "media_id"):
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, rates, nf, sums = [], [], [], []
        for mid, p in zip(batch[self.id_col].to_pylist(),
                          batch[self.payload_col].to_pylist()):
            rate, samples = decode_wav(p)
            ids.append(mid)
            rates.append(rate)
            nf.append(samples.shape[0])
            sums.append(int(samples.astype(np.int64).sum()))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "sample_rate": pa.array(rates, pa.int64()),
            "n_frames": pa.array(nf, pa.int64()),
            "sample_sum": pa.array(sums, pa.int64()),
        })
