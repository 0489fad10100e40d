from __future__ import annotations

import numpy as np
import pytest

from cdr_analysis_tools_hadoop_spark.functions import codec
from cdr_analysis_tools_hadoop_spark.sources import synthetic


def _pattern(n=3, size=32):
    return synthetic.generate_pixels(np.arange(n), size, size)


def test_rawz_lossless_roundtrip():
    for pix in _pattern():
        blob = codec.encode_rawz(pix)
        out = codec.decode(blob)
        assert (out == pix).all()
        assert codec.psnr(pix, out) == float("inf")


def test_pngl_lossless_roundtrip():
    for pix in _pattern():
        out = codec.decode(codec.encode_pngl(pix))
        assert (out == pix).all()


def test_pngl_compresses_smoother_content():
    smooth = np.tile(np.arange(64, dtype=np.uint8)[None, :, None], (64, 1, 3))
    assert len(codec.encode_pngl(smooth)) < len(codec.encode_rawz(smooth))


def test_qnt4_lossy_psnr_gate():
    """BASELINE.json input_hint: decoded pixels PSNR >= 40 dB for lossy."""
    for pix in _pattern(n=5, size=64):
        out = codec.decode(codec.encode_qnt4(pix))
        assert out.shape == pix.shape
        assert codec.psnr(pix, out) >= 40.0


def test_qz2_downsample_roundtrip_shape():
    for pix in _pattern(n=3, size=32):
        out = codec.decode(codec.encode_qz2(pix))
        assert out.shape == pix.shape
        # smooth content survives downsampling well; the synthetic
        # pattern is adversarial, so only a weak bound applies here
        assert codec.psnr(pix, out) > 10.0


def test_unknown_and_stubbed_codecs():
    with pytest.raises(ValueError):
        codec.decode(b"XXXX\x10\x00\x10\x00\x03payload")
    import struct

    blob = struct.pack("<4sHHB", b"JPEG", 16, 16, 3) + b"\x00"
    with pytest.raises(NotImplementedError):
        codec.decode(blob)


def test_phash_deterministic_and_discriminative():
    pix = _pattern(n=8, size=32)
    hashes = [codec.phash_ahash(p) for p in pix]
    assert hashes == [codec.phash_ahash(p) for p in pix]
    assert len(set(hashes)) > 1
    # all 64 cell bits survive verbatim in a signed int64 (the old
    # 2^53-1 fold scrambled the top bits and broke Hamming distance)
    assert all(-(2**63) <= h < 2**63 for h in hashes)
    # one flipped cell must stay at Hamming distance 1
    import numpy as np

    a = pix[0].copy()
    a[:4, :4] = 255 - a[:4, :4]  # flip one 8x8-grid cell's luma hard
    d = bin((codec.phash_ahash(pix[0]) ^ codec.phash_ahash(a)) & (2**64 - 1))
    assert d.count("1") <= 2


def test_shape_groups_split_mixed_channel_batches():
    """Same (h, w) with different channel counts (or gray 2-D arrays)
    must land in separate stacks — np.stack would raise otherwise."""
    import numpy as np

    from cdr_analysis_tools_hadoop_spark.operators.multimodal import (
        _shape_groups,
    )

    pix = [
        np.zeros((4, 4, 3), dtype=np.uint8),
        np.ones((4, 4), dtype=np.uint8),        # gray, 2-D
        np.full((4, 4, 1), 2, dtype=np.uint8),  # gray, explicit channel
        np.full((4, 4, 3), 3, dtype=np.uint8),
        np.full((2, 4, 3), 4, dtype=np.uint8),
    ]
    got = {tuple(idxs): stack.shape for idxs, stack in _shape_groups(pix)}
    assert got == {
        (0, 3): (2, 4, 4, 3),
        (1,): (1, 4, 4),
        (2,): (1, 4, 4, 1),
        (4,): (1, 2, 4, 3),
    }
    # every index appears exactly once
    assert sorted(i for k in got for i in k) == [0, 1, 2, 3, 4]
