"""Native C++ library (native/libife_native.so): build + parity with the
pure-Python paths. Skipped when no toolchain can build it."""
import numpy as np
import pytest

from ife_tpu import native_lib as N
from ife_tpu.core.volume import Volume, synthetic_ct
from ife_tpu.io.hr2 import read_hr2, write_hr2

pytestmark = pytest.mark.skipif(
    not N.build(), reason="native toolchain unavailable"
)


def test_histogram_matches_numpy():
    rng = np.random.default_rng(0)
    v = rng.normal(size=300_000).astype(np.float32)
    edges = np.linspace(-3, 3, 17)
    mask = (rng.random(v.size) > 0.4).astype(np.uint8)
    got = N.histogram_native(v, edges, mask)
    want = np.bincount(
        np.searchsorted(edges, v[mask != 0], side="left"), minlength=18
    )
    np.testing.assert_array_equal(got, want)
    assert got.sum() == int(mask.sum())


def test_histogram_channels_matches_numpy():
    rng = np.random.default_rng(1)
    V = rng.normal(size=(100_000, 8)).astype(np.float32)
    E = np.sort(rng.normal(size=(8, 5)), axis=1)
    got = N.histogram_channels_native(V, E)
    for h in range(8):
        want = np.bincount(
            np.searchsorted(E[h], V[:, h], side="left"), minlength=6
        )
        np.testing.assert_array_equal(got[h], want)


def test_hr2_native_python_cross_compat(tmp_path):
    vol = Volume(
        synthetic_ct((24, 20, 16), seed=1).data,
        spacing=(0.7, 0.8, 1.25), origin=(1.0, 2.0, 3.0),
    )
    # native writes -> python reads
    assert N.hr2_write_native(
        str(tmp_path / "n.hr2"), vol.numpy(), vol.spacing, vol.origin
    )
    back = read_hr2(str(tmp_path / "n.hr2"), native=False)
    np.testing.assert_allclose(back.numpy(), vol.numpy())
    assert back.spacing == vol.spacing and back.origin == vol.origin
    # python writes -> native reads
    write_hr2(str(tmp_path / "p.hr2"), vol)
    data, spacing, origin = N.hr2_read_native(str(tmp_path / "p.hr2"))
    np.testing.assert_allclose(data, vol.numpy())
    assert spacing == vol.spacing and origin == vol.origin
    # and the default read path uses the native reader transparently
    via_default = read_hr2(str(tmp_path / "p.hr2"))
    np.testing.assert_allclose(via_default.numpy(), vol.numpy())


def test_hr2_native_char_pixels(tmp_path):
    data = np.arange(-60, 60, dtype=np.float32).reshape(5, 4, 6)
    assert N.hr2_write_native(
        str(tmp_path / "c.hr2"), data, (1, 1, 1), (0, 0, 0), pixel_type="char"
    )
    back, _, _ = N.hr2_read_native(str(tmp_path / "c.hr2"))
    np.testing.assert_allclose(back, data)


def test_hr2_native_error_paths(tmp_path):
    p = tmp_path / "bad.hr2"
    p.write_bytes(b"HR3garbage")
    with pytest.raises(ValueError, match="not an HR2"):
        N.hr2_read_native(str(p))
    with pytest.raises(ValueError, match="cannot open"):
        N.hr2_read_native(str(tmp_path / "missing.hr2"))


def test_dense_histogram_native_path_matches():
    from ife_tpu.stats.histogram import DenseHistogram

    rng = np.random.default_rng(2)
    v = rng.normal(size=200_000).astype(np.float32)  # > 1<<16: native path
    edges = np.linspace(-2, 2, 9)
    h1 = DenseHistogram(edges)
    h1.insert_many(v)
    want = np.bincount(np.searchsorted(edges, v, side="left"), minlength=10)
    np.testing.assert_array_equal(h1.get_counts(), want)


def test_jll_native_matches_python_decoder():
    """The C++ JPEG-Lossless decoder must be byte-identical to the Python
    reference on random and CT-like frames (skips if lib unbuilt)."""
    import numpy as np
    import pytest
    from ife_tpu.native_lib import build, jll_decode_native
    from ife_tpu.io.jpegll import decode_jpeg_lossless, encode_jpeg_lossless

    if not build():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(21)
    frames = [
        rng.integers(0, 1 << 12, size=(33, 17)).astype(np.uint16),
        (rng.normal(-600, 100, size=(128, 128)).astype(np.int16)
         ).view(np.uint16),
        np.full((5, 5), 7, np.uint16),  # constant image (1-symbol table)
    ]
    for img in frames:
        enc = encode_jpeg_lossless(img, precision=16)
        got = jll_decode_native(enc, *img.shape)
        if got is None:
            pytest.skip("jll symbol missing")
        np.testing.assert_array_equal(got, decode_jpeg_lossless(enc))
        np.testing.assert_array_equal(got, img)


def test_jll_native_speed_sanity():
    """The native decoder exists to make series conversion practical:
    require it to beat the Python decoder by >5x on a CT-sized slice."""
    import time

    import numpy as np
    import pytest
    from ife_tpu.native_lib import build, jll_decode_native
    from ife_tpu.io.jpegll import decode_jpeg_lossless, encode_jpeg_lossless

    if not build():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(22)
    img = (rng.normal(-600, 80, size=(512, 512)).astype(np.int16)
           ).view(np.uint16)
    enc = encode_jpeg_lossless(img, precision=16)
    if jll_decode_native(enc, 512, 512) is None:
        pytest.skip("jll symbol missing")
    t0 = time.perf_counter()
    jll_decode_native(enc, 512, 512)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    decode_jpeg_lossless(enc)
    t_py = time.perf_counter() - t0
    assert t_native * 5 < t_py, (t_native, t_py)


def test_jls_native_matches_python_decoder():
    """The C++ JPEG-LS (T.87) decoder must be byte-identical to the
    Python reference: random, CT-like, run-mode-heavy, near-lossless,
    and LSE zero-preset streams (skips if lib unbuilt)."""
    import struct

    import numpy as np
    import pytest
    from ife_tpu.native_lib import build, jls_decode_native
    from ife_tpu.io.jpegls import decode_jpegls, encode_jpegls

    if not build():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(23)
    flat = np.zeros((20, 30), np.uint16)
    flat[5:9, 10:20] = 700
    flat[19, 29] = 4000
    cases = [
        (rng.integers(0, 1 << 12, size=(33, 17)).astype(np.uint16), 12, 0),
        ((rng.normal(-600, 100, size=(64, 64)).astype(np.int16)
          ).view(np.uint16), 16, 0),
        (flat, 12, 0),
        (np.full((11, 23), 513, np.uint16), 12, 0),  # pure run mode
        (rng.integers(0, 4096, size=(25, 25)).astype(np.uint16), 12, 2),
    ]
    for img, prec, near in cases:
        enc = encode_jpegls(img, precision=prec, near=near)
        got = jls_decode_native(enc, *img.shape)
        if got is None:
            pytest.skip("jls symbol missing")
        np.testing.assert_array_equal(got, decode_jpegls(enc))
    # LSE with zero presets (defaults) must decode identically too
    img = rng.integers(0, 1 << 12, size=(11, 9)).astype(np.uint16)
    enc = encode_jpegls(img, precision=12)
    lse = struct.pack(">HHB", 0xFFF8, 2 + 11, 1) + struct.pack(
        ">HHHHH", 4095, 0, 0, 0, 0)
    patched = enc[:15] + lse + enc[15:]
    got = jls_decode_native(patched, 11, 9)
    if got is not None:
        np.testing.assert_array_equal(got, img)


def test_jls_native_speed_sanity():
    """Series conversion practicality: the native T.87 decoder must beat
    the Python decoder by >5x on a CT-sized slice."""
    import time

    import numpy as np
    import pytest
    from ife_tpu.native_lib import build, jls_decode_native
    from ife_tpu.io.jpegls import decode_jpegls, encode_jpegls

    if not build():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(24)
    img = (rng.normal(-600, 80, size=(512, 512)).astype(np.int16)
           ).view(np.uint16)
    enc = encode_jpegls(img, precision=16)
    if jls_decode_native(enc, 512, 512) is None:
        pytest.skip("jls symbol missing")
    t0 = time.perf_counter()
    jls_decode_native(enc, 512, 512)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    decode_jpegls(enc)
    t_py = time.perf_counter() - t0
    assert t_native * 5 < t_py, (t_native, t_py)
