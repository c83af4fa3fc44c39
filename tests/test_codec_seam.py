"""Real-codec seam: PIL/soundfile dispatch behind the stub APIs.

The container has neither library, so the always-run tests pin the
honest NotImplementedError boundary; the conditional tests run the real
round-trip wherever the libraries exist (a production deployment)."""

import numpy as np
import pytest

from btrblocks_spark.functions import images, media


def test_stub_magics_still_roundtrip():
    px = (np.arange(4 * 6 * 3) % 251).astype(np.uint8).reshape(4, 6, 3)
    for fmt in ("bmp", "png"):
        assert (images.decode_image(images.encode_image(px, fmt)) == px).all()


def test_real_jpeg_magic_raises_without_pil():
    if images.HAVE_PIL:
        pytest.skip("PIL present: the seam dispatches instead of raising")
    with pytest.raises(NotImplementedError):
        images.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
    with pytest.raises(NotImplementedError):
        images.encode_image(np.zeros((2, 2, 3), np.uint8), "real-jpeg")


def test_real_png_roundtrips_in_sandbox():
    """The dependency-free PNG codec (png_pure.py) closes the lossless
    half of the seam with NO image library: real \x89PNG bytes decode
    and fmt='real-png' encodes — bit-exact round trip."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (19, 31, 3), dtype=np.uint8)
    blob = images.encode_image(px, "real-png")
    assert blob.startswith(b"\x89PNG\r\n\x1a\n")
    assert (images.decode_image(blob) == px).all()


def test_pure_png_decodes_all_filters_and_color_types():
    """Hand-built PNGs using Average/Paeth filters and gray/RGBA/
    palette color types decode correctly (spec-complete unfiltering)."""
    import struct
    import zlib

    from btrblocks_spark.functions.png_pure import decode_png

    rng = np.random.default_rng(3)
    h, w = 5, 7

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    # every scanline filter, reference-filtered by a direct loop
    img = rng.integers(0, 256, (h, w, 3), np.int32)
    raw = bytearray()
    prev = np.zeros(w * 3, np.int32)
    for y in range(h):
        rec = img[y].reshape(-1)
        ftype = [0, 1, 2, 3, 4][y]
        raw.append(ftype)
        filt = np.empty(w * 3, np.int32)
        for x in range(w * 3):
            a = rec[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c
                )
            filt[x] = (rec[x] - pred) & 0xFF
        raw += filt.astype(np.uint8).tobytes()
        prev = rec
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(png) == img.astype(np.uint8)).all()

    def mk(ctype, channels, plte=None):
        body = rng.integers(
            0, 4 if ctype == 3 else 256, (h, w, channels), np.uint8
        )
        raw = b"".join(b"\x00" + body[y].tobytes() for y in range(h))
        chunks = chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        )
        if plte is not None:
            chunks += chunk(b"PLTE", plte.tobytes())
        return (
            b"\x89PNG\r\n\x1a\n" + chunks
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""),
            body,
        )

    p6, b6 = mk(6, 4)
    assert (decode_png(p6) == b6[:, :, :3]).all()
    p0, b0 = mk(0, 1)
    assert (decode_png(p0) == np.repeat(b0, 3, 2)).all()
    pal = rng.integers(0, 256, (4, 3), np.uint8)
    p3, b3 = mk(3, 1, pal)
    assert (decode_png(p3) == pal[b3[:, :, 0]]).all()
    # interlaced / 16-bit profiles stay behind the honest boundary
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1))
    )
    with pytest.raises(NotImplementedError):
        decode_png(bad)


def test_real_audio_magic_raises_without_soundfile():
    if media.HAVE_SOUNDFILE:
        pytest.skip("soundfile present: the seam dispatches")
    with pytest.raises(NotImplementedError):
        media.decode_audio(b"RIFF" + b"\x00" * 32)


@pytest.mark.skipif(not images.HAVE_PIL, reason="PIL not installed")
def test_pil_roundtrip_real_png():
    px = (np.arange(8 * 8 * 3) % 256).astype(np.uint8).reshape(8, 8, 3)
    blob = images.encode_image(px, "real-png")
    assert blob.startswith(b"\x89PNG")
    out = images.decode_image(blob)
    assert (out == px).all()  # png lossless


@pytest.mark.skipif(
    not media.HAVE_SOUNDFILE, reason="soundfile not installed"
)
def test_soundfile_roundtrip_real_wav():
    import io

    import soundfile as sf

    pcm = (np.sin(np.arange(1600) / 10) * 2000).astype(np.int16)
    sink = io.BytesIO()
    sf.write(sink, pcm, 16000, format="WAV", subtype="PCM_16")
    out, rate = media.decode_audio(sink.getvalue())
    assert rate == 16000 and out.shape[0] == 1600


def test_unknown_magic_still_raises():
    with pytest.raises(NotImplementedError):
        images.decode_image(b"XXXX" + b"\x00" * 16)
    with pytest.raises(NotImplementedError):
        media.decode_audio(b"ZZZZ" + b"\x00" * 16)


def test_jpd_dct_codec_clears_psnr_gate_on_any_input():
    """The dependency-free DCT codec (jpeg_pure.py) makes the lossy
    half of the input_hint's PSNR >= 40 dB gate REAL in-sandbox:
    quantization error is content-independent, so even a pure-noise
    image (the adversarial case) clears the gate at default quality."""
    rng = np.random.default_rng(7)
    cases = [
        rng.integers(0, 256, (37, 53, 3), dtype=np.uint8),  # noise
        np.tile(
            np.linspace(0, 255, 64, dtype=np.uint8)[None, :, None],
            (48, 1, 3),
        ),  # smooth gradient
        np.zeros((8, 8, 3), np.uint8),  # flat
    ]
    for px in cases:
        blob = images.encode_image(px, "jpd")
        assert blob.startswith(b"FJPD")
        out = images.decode_image(blob)
        assert out.shape == px.shape
        assert images.psnr(px, out) >= 40.0
    # deterministic: same pixels -> same bytes (oracle/replay safety)
    assert images.encode_image(cases[0], "jpd") == images.encode_image(
        cases[0], "jpd"
    )


def test_jpd_through_reencode_check_kernel():
    """fmt='jpd' rows flow through the PSNR verify kernel as a lossy
    format (not byte-equality) and pass the 40 dB gate."""
    import pyarrow as pa

    rng = np.random.default_rng(8)
    rows = []
    for i in range(4):
        px = rng.integers(0, 256, (16 + 8 * i, 24, 3), dtype=np.uint8)
        rows.append(
            {
                "image_id": f"im{i}",
                "bytes": images.encode_image(px, "jpd"),
                "fmt": "jpd",
            }
        )
    batch = pa.RecordBatch.from_pylist(rows)
    out = list(images.reencode_check_batches(iter([batch])))
    tbl = pa.Table.from_batches(out)
    assert tbl.num_rows == 4
    assert all(tbl.column("ok").to_pylist())
    assert all(p >= 40.0 for p in tbl.column("psnr").to_pylist())
