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


def test_real_magic_raises_without_pil():
    if images.HAVE_PIL:
        pytest.skip("PIL present: the seam dispatches instead of raising")
    real_png_head = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
    with pytest.raises(NotImplementedError):
        images.decode_image(real_png_head)
    with pytest.raises(NotImplementedError):
        images.encode_image(np.zeros((2, 2, 3), np.uint8), "real-png")


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
