"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment): ``DecodeImage`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake decode
(hash-seeded pseudo-pixels) so the Ray-side plumbing — schema, batch
sizing, actor signature, output layout — is real and tested end-to-end.

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


class DecodeImage:
    """binary payload → fixed-size float feature row.

    Output: media_id:int64, width:int32, height:int32,
    features:list<float> (dim ``feat_dim``).
    """

    def __init__(self, payload_col: str = "payload",
                 id_col: str = "media_id", feat_dim: int = 64,
                 fake: bool = False):
        self.payload_col = payload_col
        self.id_col = id_col
        self.feat_dim = feat_dim
        self.fake = fake
        if not fake:
            try:
                import PIL.Image  # noqa: F401
                self._pil = True
            except ImportError:
                self._pil = False

    def _decode_real(self, payload: bytes):
        if not getattr(self, "_pil", False):
            raise NotImplementedError(
                "image decoding requires PIL (not in this environment); "
                "construct DecodeImage(fake=True) for plumbing tests")
        raise NotImplementedError("real decode path not implemented")

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
            feats.append(f)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
        })


class FrameSample:
    """video binary → one row per sampled frame offset (metadata only;
    the decode is the same stubbed boundary as DecodeImage)."""

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


def decode_images(ds, *, fake: bool = True, feat_dim: int = 64,
                  batch_size: int = 64, concurrency=2):
    """Actor-pool decode stage over a media dataset (small batches: binary
    payloads dominate memory)."""
    return ds.map_batches(DecodeImage,
                          fn_constructor_kwargs=dict(fake=fake,
                                                     feat_dim=feat_dim),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)
