"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED (no PIL/ffmpeg/librosa in this
environment — each actor probes for the real library in ``__init__`` and
otherwise uses a deterministic fake decoder over a self-describing synthetic
payload format), but the Ray-side plumbing is real and tested: schema,
actor signature, per-actor init, batch sizing for MB-scale binary rows,
output layout.

Reference analog: page rasterization + per-page OCR inside the parser
process (/root/reference/src/services/RAG/ocr_engine.py:59-66,115-168) and
the page-PNG -> Gemini vision path (/root/reference/main.py:141-144) — i.e.
"binary payload in, features out, model held per worker".

Synthetic payload grammar (``make_fake_image``): ``RPXIMG1`` magic +
width/height/channels as u32 LE + seed byte stream. Real decoders replace
``_decode`` only; everything else is unchanged.
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Tuple

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.large_binary()),
    ("meta", pa.struct([("source", pa.string()), ("codec", pa.string())])),
])

IMG_MAGIC = b"RPXIMG1"


def make_fake_image(media_id: int, width: int, height: int,
                    channels: int = 3) -> bytes:
    """Deterministic synthetic image payload (stands in for PNG/JPEG)."""
    header = IMG_MAGIC + struct.pack("<III", width, height, channels)
    n = width * height * channels
    seed = hashlib.sha256(str(media_id).encode()).digest()
    reps = -(-n // len(seed))
    return header + (seed * reps)[:n]


def parse_fake_image(payload: bytes) -> Tuple[int, int, int, np.ndarray]:
    if not payload.startswith(IMG_MAGIC):
        raise ValueError("not an RPXIMG1 payload")
    w, h, c = struct.unpack("<III", payload[len(IMG_MAGIC):len(IMG_MAGIC) + 12])
    pix = np.frombuffer(payload[len(IMG_MAGIC) + 12:], dtype=np.uint8)
    return w, h, c, pix.reshape(h, w, c)


class DecodeImageFeatures:
    """Actor-pool stage: image payload -> (width, height, mean intensity,
    16-bin histogram). With a real imaging library present the same actor
    decodes real formats; here the deterministic fake decoder keeps the
    plumbing testable. Use small batch_size — rows are MBs."""

    def __init__(self) -> None:
        try:
            from PIL import Image  # noqa: F401
            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode(self, payload: bytes) -> Tuple[int, int, np.ndarray]:
        if payload.startswith(IMG_MAGIC):
            w, h, _, pix = parse_fake_image(payload)
            return w, h, pix
        if self._pil is None:
            raise NotImplementedError(
                "real image decoding needs PIL; payload is not RPXIMG1")
        import io
        img = self._pil.open(io.BytesIO(payload))
        arr = np.asarray(img)
        return img.width, img.height, arr

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths: List[int] = []
        heights: List[int] = []
        means: List[float] = []
        hists: List[list] = []
        for payload in batch.column("payload").to_pylist():
            w, h, pix = self._decode(payload or b"")
            widths.append(w)
            heights.append(h)
            means.append(round(float(pix.mean()), 4))
            hist, _ = np.histogram(pix, bins=16, range=(0, 256))
            hists.append(hist.astype("int64").tolist())
        return pa.table({
            "media_id": batch.column("media_id"),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "mean_intensity": pa.array(means, pa.float64()),
            "histogram": pa.array(hists, pa.list_(pa.int64(), 16)),
        })


class ResizeImage:
    """Actor-pool stage: nearest-neighbor resize (numpy; a real backend
    would swap in PIL/opencv). Demonstrates binary-in/binary-out layout."""

    def __init__(self, target: int = 64) -> None:
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: List[bytes] = []
        for payload in batch.column("payload").to_pylist():
            w, h, c, pix = parse_fake_image(payload or b"")
            t = self.target
            yi = (np.arange(t) * h // t)
            xi = (np.arange(t) * w // t)
            small = pix[yi][:, xi]
            out.append(IMG_MAGIC + struct.pack("<III", t, t, c)
                       + small.tobytes())
        return pa.table({
            "media_id": batch.column("media_id"),
            "payload": pa.array(out, pa.large_binary()),
        })


AUD_MAGIC = b"RPXAUD1"


def make_fake_audio(media_id: int, n_samples: int,
                    sample_rate: int = 16000) -> bytes:
    """Deterministic synthetic PCM payload (stands in for WAV/FLAC):
    magic + sample_rate/n_samples u32 LE + int16 LE samples."""
    header = AUD_MAGIC + struct.pack("<II", sample_rate, n_samples)
    seed = hashlib.sha256(str(media_id).encode()).digest()
    reps = -(-n_samples * 2 // len(seed))
    body = (seed * reps)[:n_samples * 2]
    return header + body


class DecodeAudioFeatures:
    """Actor-pool stage: audio payload -> (duration_s, rms, zero-crossing
    rate). STUB decode: no librosa/soundfile in this environment — the
    actor probes for soundfile in __init__ and otherwise decodes the
    deterministic RPXAUD1 PCM payload; the feature math (numpy, real) and
    the Ray plumbing are identical either way. Small batch_size — rows
    are MBs of samples."""

    def __init__(self) -> None:
        try:
            import soundfile  # noqa: F401
            self._sf = soundfile
        except ImportError:
            self._sf = None

    def _decode(self, payload: bytes) -> Tuple[int, np.ndarray]:
        if payload.startswith(AUD_MAGIC):
            off = len(AUD_MAGIC)
            rate, n = struct.unpack("<II", payload[off:off + 8])
            samples = np.frombuffer(payload[off + 8:off + 8 + 2 * n],
                                    dtype="<i2").astype(np.float64) / 32768.0
            return rate, samples
        if self._sf is None:
            raise NotImplementedError(
                "real audio decoding needs soundfile; payload is not RPXAUD1")
        import io
        samples, rate = self._sf.read(io.BytesIO(payload))
        return rate, np.asarray(samples, dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs: List[float] = []
        rms: List[float] = []
        zcr: List[float] = []
        for payload in batch.column("payload").to_pylist():
            rate, x = self._decode(payload or b"")
            durs.append(round(len(x) / max(1, rate), 6))
            rms.append(round(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0, 6))
            z = np.mean(np.abs(np.diff(np.signbit(x)))) if len(x) > 1 else 0.0
            zcr.append(round(float(z), 6))
        return pa.table({
            "media_id": batch.column("media_id"),
            "duration_s": pa.array(durs, pa.float64()),
            "rms": pa.array(rms, pa.float64()),
            "zero_crossing_rate": pa.array(zcr, pa.float64()),
        })


class SampleVideoFrames:
    """Actor-pool stage: video payload -> every k-th frame as an image row
    (flat-map layout). STUB: the synthetic 'video' is a concatenation of
    RPXIMG1 frames; a real backend (ffmpeg) replaces ``_frames`` only."""

    def __init__(self, every: int = 10) -> None:
        self.every = every

    def _frames(self, payload: bytes) -> List[bytes]:
        frames = []
        pos = 0
        while pos < len(payload):
            if not payload[pos:].startswith(IMG_MAGIC):
                raise NotImplementedError(
                    "real video decoding needs ffmpeg; payload is not "
                    "RPXIMG1-concat")
            w, h, c = struct.unpack(
                "<III", payload[pos + len(IMG_MAGIC):pos + len(IMG_MAGIC) + 12])
            size = len(IMG_MAGIC) + 12 + w * h * c
            frames.append(payload[pos:pos + size])
            pos += size
        return frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: List[int] = []
        fnos: List[int] = []
        payloads: List[bytes] = []
        for media_id, payload in zip(batch.column("media_id").to_pylist(),
                                     batch.column("payload").to_pylist()):
            frames = self._frames(payload or b"")
            for i in range(0, len(frames), self.every):
                ids.append(media_id)
                fnos.append(i)
                payloads.append(frames[i])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_no": pa.array(fnos, pa.int32()),
            "payload": pa.array(payloads, pa.large_binary()),
        })
