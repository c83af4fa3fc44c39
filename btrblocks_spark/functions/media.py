"""Multimodal audio/video-column handling.

Like images (``functions/images.py``), audio and video travel as opaque
``binary`` cells with typed metadata columns; this module gives the
engine the decode / feature-extract / frame-sample kernels a
training-data pipeline needs over them. Every kernel is Arrow-batched
(``mapInArrow``) with zero-copy buffer slicing — at 10^12 rows each is
one narrow map stage, no shuffle.

STUB NOTICE: no real media libraries (ffmpeg/libsndfile) exist in this
container, so the codecs are deterministic stand-ins with the right
*shape*:

- audio ``fwav`` — header (rate, channels, n_samples) + zlib'd int16 PCM
- video ``fvid`` — header (w, h, fps, n_frames) + a per-frame OFFSET
  TABLE + independently zlib'd uint8 frames, so frame sampling SEEKS to
  the k-th frame instead of decoding the stream (the property a real
  keyframe-indexed container gives you)

Unknown magics raise NotImplementedError — a real ffmpeg binding drops
in behind ``decode_audio`` / ``video_frame`` without touching the Spark
plumbing, exactly like the image codecs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from btrblocks_spark.functions.images import _binary_views, encode_image

MAGIC_WAV = b"FWAV"
MAGIC_VID = b"FVID"

# Optional real-codec seam (mirrors images.HAVE_PIL): when soundfile
# exists, real audio containers (RIFF/WAVE, FLAC, OGG) decode through it
# behind the same decode_audio API. Absent (this container), real
# formats keep raising NotImplementedError; the stub tests never notice.
try:  # pragma: no cover - exercised only where soundfile is installed
    import io as _io

    import soundfile as _soundfile

    HAVE_SOUNDFILE = True
except ImportError:
    HAVE_SOUNDFILE = False

_REAL_AUDIO_MAGICS = (b"RIFF", b"fLaC", b"OggS")


def _decode_audio_real(data) -> tuple[np.ndarray, int]:
    if not HAVE_SOUNDFILE:
        raise NotImplementedError(
            "real audio formats need a media library not present here"
        )
    pcm, rate = _soundfile.read(_io.BytesIO(bytes(data)), dtype="int16")
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    return pcm, int(rate)


# ------------------------------------------------------------------ audio
def encode_audio(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """samples: (n,) or (n, channels) int16 -> encoded bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    head = struct.pack("<IIB", rate, n, ch)
    return MAGIC_WAV + head + zlib.compress(
        samples.astype("<i2").tobytes(), 1
    )


def decode_audio(data) -> tuple[np.ndarray, int]:
    """encoded bytes/memoryview -> ((n, channels) int16, sample_rate)."""
    magic = bytes(data[:4])
    if magic != MAGIC_WAV:
        if magic in _REAL_AUDIO_MAGICS:
            return _decode_audio_real(data)  # soundfile seam
        raise NotImplementedError(
            "real audio formats need a media library not present here"
        )
    rate, n, ch = struct.unpack("<IIB", data[4:13])
    pcm = np.frombuffer(zlib.decompress(data[13:]), "<i2")
    return pcm.reshape(n, ch), rate


def audio_stats_batches(batch_iter):
    """mapInArrow kernel: (audio_id, bytes) -> per-clip signal stats
    (duration, RMS, peak, clipping rate) — the standard quality gates a
    speech/audio corpus filter runs before training."""
    for batch in batch_iter:
        ids = batch.column("audio_id")
        offs, buf = _binary_views(batch.column("bytes"))
        n = len(batch)
        dur = np.empty(n)
        rms = np.empty(n)
        peak = np.empty(n)
        clip = np.empty(n)
        for i in range(n):
            pcm, rate = decode_audio(buf[offs[i] : offs[i + 1]])
            x = pcm.astype(np.float64) / 32768.0
            dur[i] = len(pcm) / max(rate, 1)
            rms[i] = float(np.sqrt((x**2).mean())) if len(x) else 0.0
            peak[i] = float(np.abs(x).max()) if len(x) else 0.0
            clip[i] = float((np.abs(pcm) >= 32767).mean()) if len(pcm) else 0.0
        yield pa.RecordBatch.from_pydict(
            {
                "audio_id": ids,
                "duration_s": pa.array(dur),
                "rms": pa.array(rms),
                "peak": pa.array(peak),
                "clip_rate": pa.array(clip),
            }
        )


# ------------------------------------------------------------------ video
def encode_video(frames: np.ndarray, fps: int = 10) -> bytes:
    """frames: (n_frames, h, w, 3) uint8 -> encoded bytes with a
    per-frame offset table (seekable)."""
    nf, h, w, c = frames.shape
    assert c == 3
    blobs = [zlib.compress(frames[i].tobytes(), 1) for i in range(nf)]
    offsets = np.zeros(nf + 1, "<u8")
    offsets[1:] = np.cumsum([len(b) for b in blobs])
    head = struct.pack("<HHHI", w, h, fps, nf)
    return MAGIC_VID + head + offsets.tobytes() + b"".join(blobs)


def _video_header(data):
    if bytes(data[:4]) != MAGIC_VID:
        raise NotImplementedError(
            "real video containers need a media library not present here"
        )
    w, h, fps, nf = struct.unpack("<HHHI", data[4:14])
    table_end = 14 + 8 * (nf + 1)
    offsets = np.frombuffer(data[14:table_end], "<u8")
    return w, h, fps, nf, offsets, table_end


def video_frame(data, idx: int) -> np.ndarray:
    """Seek-decode ONE frame — O(frame), not O(video)."""
    w, h, fps, nf, offsets, base = _video_header(data)
    if not 0 <= idx < nf:
        raise IndexError(idx)
    lo, hi = base + int(offsets[idx]), base + int(offsets[idx + 1])
    px = np.frombuffer(zlib.decompress(data[lo:hi]), np.uint8)
    return px.reshape(h, w, 3)


def video_meta(data) -> dict:
    w, h, fps, nf, _, _ = _video_header(data)
    return {"w": w, "h": h, "fps": fps, "n_frames": nf}


def frame_sample_batches(batch_iter, every_k: int = 5, out_fmt: str = "png"):
    """mapInArrow kernel: (video_id, bytes) -> one row per SAMPLED frame
    (video_id, frame_idx, w, h, frame_bytes as an image-format cell).

    Seeks straight to every k-th frame via the container's offset table
    (never decodes the frames in between) and re-encodes each into the
    image pipeline's format — the output feeds phash near-dup, resize
    and pixel-stats kernels unchanged. Output cardinality is
    n_frames/k per video; at 10^12 frames this stays a single narrow
    map stage whose fan-out is data, not shuffle."""
    for batch in batch_iter:
        vids = batch.column("video_id").to_pylist()
        offs, buf = _binary_views(batch.column("bytes"))
        out_ids: list = []
        out_idx: list[int] = []
        out_w: list[int] = []
        out_h: list[int] = []
        out_bytes: list[bytes] = []
        for i, vid in enumerate(vids):
            cell = buf[offs[i] : offs[i + 1]]
            w, h, fps, nf, offsets, base = _video_header(cell)
            for k in range(0, nf, every_k):
                lo, hi = base + int(offsets[k]), base + int(offsets[k + 1])
                px = np.frombuffer(
                    zlib.decompress(cell[lo:hi]), np.uint8
                ).reshape(h, w, 3)
                out_ids.append(vid)
                out_idx.append(k)
                out_w.append(w)
                out_h.append(h)
                out_bytes.append(encode_image(px, out_fmt))
        yield pa.RecordBatch.from_pydict(
            {
                "video_id": pa.array(out_ids, pa.string()),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "w": pa.array(out_w, pa.int32()),
                "h": pa.array(out_h, pa.int32()),
                "frame_bytes": pa.array(out_bytes, pa.large_binary()),
            }
        )
