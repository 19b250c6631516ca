"""IO round-trip and format-semantics tests."""
import gzip
import io
import numpy as np
import pytest

from ife_tpu.core.volume import Volume
from ife_tpu.io.nifti import read_nifti, write_nifti
from ife_tpu.io.hr2 import read_hr2, write_hr2, _write_field_length, _read_field_length
from ife_tpu.io.octave import read_octave, write_octave
from ife_tpu.io.roi_text import read_rois, write_rois
from ife_tpu.io.hist_spec import read_hist_spec, write_hist_spec
from ife_tpu.io.text import (
    read_pair_list,
    read_text_matrix,
    read_text_sequence,
    write_sequence_as_text,
    write_matrix_csv,
)
from ife_tpu.io.volume_io import read_volume, write_volume
from ife_tpu.roi.generate import ROI


def _vol(shape=(7, 6, 5), dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    return Volume(
        rng.standard_normal(shape).astype(dtype) * 100,
        spacing=(0.7, 0.8, 1.25),
        origin=(-12.5, 3.0, 42.0),
    )


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.uint8, np.int16, np.uint16, np.float64])
def test_nifti_roundtrip(tmp_path, suffix, dtype):
    v = _vol(dtype=dtype)
    p = str(tmp_path / f"vol{suffix}")
    write_nifti(p, v)
    r = read_nifti(p)
    np.testing.assert_array_equal(r.numpy(), v.numpy())
    assert r.dtype == v.dtype
    np.testing.assert_allclose(r.spacing, v.spacing, rtol=1e-6)
    np.testing.assert_allclose(r.origin, v.origin, rtol=1e-6)


def test_nifti_index_order(tmp_path):
    """Voxel [x,y,z] must land at file offset x + y*nx + z*nx*ny (x fastest)."""
    arr = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    p = str(tmp_path / "order.nii")
    write_nifti(p, Volume(arr))
    with open(p, "rb") as f:
        raw = f.read()
    data = np.frombuffer(raw[352:], dtype=np.float32)
    assert data[0] == arr[0, 0, 0]
    assert data[1] == arr[1, 0, 0]  # x fastest
    assert data[2] == arr[0, 1, 0]


@pytest.mark.parametrize("pixel_type", ["float", "char"])
def test_hr2_roundtrip(tmp_path, pixel_type):
    if pixel_type == "char":
        rng = np.random.default_rng(1)
        v = Volume(
            rng.integers(-100, 100, (5, 4, 3)).astype(np.int8),
            spacing=(1.0, 2.0, 3.0),
            origin=(0.5, -0.5, 10.0),
        )
    else:
        v = _vol((5, 4, 3))
    p = str(tmp_path / "vol.hr2")
    write_hr2(p, v, pixel_type=pixel_type)
    r = read_hr2(p)
    np.testing.assert_allclose(r.numpy(), v.numpy().astype(np.float32))
    np.testing.assert_allclose(r.spacing, v.spacing)
    np.testing.assert_allclose(r.origin, v.origin)


def test_hr2_field_length_scheme():
    """The quirky <=4-byte zero-terminated little-endian length codec
    (reference src/IO/HR2Reader.cxx:211-222)."""
    for n in (1, 5, 255, 258, 65793, 0x04030201):
        enc = _write_field_length(n)
        assert _read_field_length(io.BytesIO(enc + b"xx")) == n


def test_hr2_magic_quirk(tmp_path):
    """'HR?' accepted for any ?!='3' (HR2Reader.cxx:97-102)."""
    v = _vol((3, 3, 3))
    p = str(tmp_path / "vol.hr2")
    write_hr2(p, v)
    raw = open(p, "rb").read()
    open(p, "wb").write(b"HRX" + raw[3:])
    r = read_hr2(p)  # should still parse
    np.testing.assert_allclose(r.numpy(), v.numpy())
    open(p, "wb").write(b"HR3" + raw[3:])
    with pytest.raises(ValueError):
        read_hr2(p)


def test_octave_roundtrip_and_layout(tmp_path):
    v = Volume(np.arange(2 * 3 * 4, dtype=np.float64).reshape(2, 3, 4))
    p = str(tmp_path / "vol.octave")
    write_octave(p, v)
    r = read_octave(p)
    np.testing.assert_array_equal(r.numpy(), v.numpy())
    # stream order quirk: index ((z*sx)+x)*sy + y (OctaveReader.hxx:119-139)
    with open(p) as f:
        lines = [l for l in f if not l.startswith("#")][1:]
    vals = np.array([float(l) for l in lines])
    arr = v.numpy()
    assert vals[0] == arr[0, 0, 0]
    assert vals[1] == arr[0, 1, 0]  # y second-fastest
    assert vals[3] == arr[1, 0, 0]  # then x
    assert vals[6] == arr[0, 0, 1]  # z slowest


def test_roi_text_roundtrip(tmp_path):
    rois = [ROI((1, 2, 3), (41, 41, 41)), ROI((-1, 0, 7), (5, 6, 7))]
    p = str(tmp_path / "rois.ROIInfo")
    write_rois(p, rois, header="# index size")
    got = read_rois(p, header=True)
    assert got == rois
    # format matches ITK operator<< exactly
    line = open(p).readlines()[1].strip()
    assert line == "[1, 2, 3][41, 41, 41]"


def test_hist_spec_roundtrip(tmp_path):
    rows = [np.array([0.0, 1.5, 2.5]), np.array([-1.0, 0.0, 3.0])]
    p = str(tmp_path / "spec.txt")
    write_hist_spec(p, rows, scales=[0.5, 1.0], feature_names=["A", "B"])
    got = read_hist_spec(p)
    assert len(got) == 2
    np.testing.assert_allclose(got[0], rows[0])
    np.testing.assert_allclose(got[1], rows[1])


def test_hist_spec_unequal_bins_raises(tmp_path):
    p = str(tmp_path / "bad.txt")
    open(p, "w").write("1,2,3\n1,2\n")
    with pytest.raises(ValueError):
        read_hist_spec(p)


def test_pair_list(tmp_path):
    p = str(tmp_path / "pairs.csv")
    open(p, "w").write("img1.nii , mask1.nii\nimg2.nii,mask2.nii\n\n")
    got = read_pair_list(p)
    assert got == [("img1.nii", "mask1.nii"), ("img2.nii", "mask2.nii")]
    open(p, "w").write("no-separator-here\n")
    with pytest.raises(ValueError):
        read_pair_list(p)


def test_text_matrix_and_sequence():
    m = read_text_matrix(["1,2,3\n", "4,5,6\n"])
    np.testing.assert_array_equal(m, [[1, 2, 3], [4, 5, 6]])
    s = read_text_sequence("1.5, 2.5 ,3")
    np.testing.assert_allclose(s, [1.5, 2.5, 3.0])
    assert write_sequence_as_text([1, 2, 3]) == "1,2,3"


def test_write_matrix_csv(tmp_path):
    p = str(tmp_path / "m.bag")
    write_matrix_csv(p, np.array([[0.25, 0.75], [1.0 / 3, 2.0 / 3]]))
    lines = open(p).read().strip().split("\n")
    assert lines[0] == "0.25,0.75"
    assert lines[1] == "0.333333,0.666667"


def test_volume_io_dispatch(tmp_path):
    v = _vol((4, 4, 4))
    for name in ("a.nii.gz", "b.hr2", "c.npy"):
        p = str(tmp_path / name)
        write_volume(p, v)
        r = read_volume(p)
        np.testing.assert_allclose(r.numpy(), v.numpy(), rtol=1e-6)


# --- JPEG Lossless SV1 codec (ConvertDICOM's compressed-CT syntax) ------

def test_jpegll_roundtrip_fuzz():
    """encode -> decode identity over random images at several precisions
    and shapes (incl. non-square and single-row/column edge cases)."""
    from ife_tpu.io.jpegll import decode_jpeg_lossless, encode_jpeg_lossless

    rng = np.random.default_rng(11)
    cases = [
        ((7, 5), 12), ((16, 16), 16), ((1, 9), 8), ((9, 1), 10),
        ((32, 17), 16),
    ]
    for shape, precision in cases:
        img = rng.integers(0, 1 << precision, size=shape).astype(np.uint16)
        enc = encode_jpeg_lossless(img, precision=precision)
        dec = decode_jpeg_lossless(enc)
        np.testing.assert_array_equal(dec, img), (shape, precision)


def test_jpegll_roundtrip_ct_like():
    """CT-like content (smooth + noise, int16 two's complement stored as
    uint16) — the DICOM signed-pixel path's exact byte semantics."""
    from ife_tpu.io.jpegll import decode_jpeg_lossless, encode_jpeg_lossless

    rng = np.random.default_rng(12)
    yy, xx = np.mgrid[0:24, 0:31]
    hu = (-600 + 80 * np.sin(xx / 5.0) * np.cos(yy / 7.0)
          + rng.integers(-20, 20, size=(24, 31))).astype(np.int16)
    stored = hu.view(np.uint16)
    dec = decode_jpeg_lossless(encode_jpeg_lossless(stored, precision=16))
    np.testing.assert_array_equal(dec.view(np.int16), hu)


def test_jpegll_rejects_non_lossless_and_multicomponent():
    import pytest
    from ife_tpu.io.jpegll import decode_jpeg_lossless

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_lossless(b"\x00\x01\x02\x03")
    # a baseline-DCT SOF0 must be rejected with a clear message
    import struct as _s
    sof0 = (_s.pack(">H", 0xFFD8)
            + _s.pack(">HH", 0xFFC0, 2 + 9)
            + _s.pack(">BHHB", 8, 4, 4, 1) + bytes([0, 0x11, 0]))
    with pytest.raises(ValueError, match="SOF3"):
        decode_jpeg_lossless(sof0)


def test_jpegls_roundtrip_fuzz():
    """JPEG-LS (T.87) encode -> decode identity over random images at
    several precisions/shapes, incl. single-row/column and shapes that
    exercise the run-mode line-end rules."""
    from ife_tpu.io.jpegls import decode_jpegls, encode_jpegls

    rng = np.random.default_rng(14)
    cases = [((7, 5), 12), ((16, 16), 16), ((1, 9), 8), ((9, 1), 10),
             ((33, 17), 16), ((24, 31), 8)]
    for shape, precision in cases:
        img = rng.integers(0, 1 << precision, size=shape).astype(np.uint16)
        dec = decode_jpegls(encode_jpegls(img, precision=precision))
        np.testing.assert_array_equal(dec, img), (shape, precision)


def test_jpegls_run_mode_and_ct_like():
    """Flat regions drive the run mode (J-table segments, line-end
    closure, interruption samples); CT-like int16 stored as uint16 is the
    DICOM signed-pixel byte convention."""
    from ife_tpu.io.jpegls import decode_jpegls, encode_jpegls

    rng = np.random.default_rng(15)
    img = np.zeros((20, 30), np.uint16)
    img[5:9, 10:20] = 700
    img[15] = 1
    img[19, 29] = 4000  # interruption at the very last sample
    np.testing.assert_array_equal(
        decode_jpegls(encode_jpegls(img, precision=12)), img)
    # all-constant image: pure run mode, every line ends inside a run
    const = np.full((11, 23), 513, np.uint16)
    np.testing.assert_array_equal(
        decode_jpegls(encode_jpegls(const, precision=12)), const)
    yy, xx = np.mgrid[0:24, 0:31]
    hu = (-600 + 80 * np.sin(xx / 5.0) * np.cos(yy / 7.0)
          + rng.integers(-20, 20, size=(24, 31))).astype(np.int16)
    stored = hu.view(np.uint16)
    dec = decode_jpegls(encode_jpegls(stored, precision=16))
    np.testing.assert_array_equal(dec.view(np.int16), hu)


def test_jpegls_low_precision_thresholds():
    """Precisions 2-8 exercise the MAXVAL<128 default-threshold branch
    (FACTOR = 256/(MAXVAL+1)) in both the Python and native decoders —
    untested by the CT-focused cases; near-lossless included for the
    threshold/NEAR clamp interplay."""
    from ife_tpu.io.jpegls import decode_jpegls, encode_jpegls
    from ife_tpu.native_lib import jls_decode_native

    rng = np.random.default_rng(19)
    for prec in (2, 3, 4, 6, 8):
        img = rng.integers(0, 1 << prec, size=(19, 13)).astype(np.uint16)
        enc = encode_jpegls(img, precision=prec)
        np.testing.assert_array_equal(decode_jpegls(enc), img)
        nat = jls_decode_native(enc, 19, 13)
        if nat is not None:
            np.testing.assert_array_equal(nat, img)
    for prec, near in ((4, 1), (6, 2)):
        img = rng.integers(0, 1 << prec, size=(15, 15)).astype(np.uint16)
        enc = encode_jpegls(img, precision=prec, near=near)
        d = decode_jpegls(enc)
        assert np.abs(d.astype(int) - img.astype(int)).max() <= near
        nat = jls_decode_native(enc, 15, 15)
        if nat is not None:
            np.testing.assert_array_equal(nat, d)


def test_jpegls_near_lossless_bound():
    """NEAR > 0 (the ...4.81 DICOM syntax) bounds |decoded - original|
    by NEAR per sample (T.87 near-lossless guarantee)."""
    from ife_tpu.io.jpegls import decode_jpegls, encode_jpegls

    rng = np.random.default_rng(16)
    img = rng.integers(0, 4096, size=(25, 25)).astype(np.uint16)
    for near in (1, 2, 3):
        dec = decode_jpegls(encode_jpegls(img, precision=12, near=near))
        err = np.abs(dec.astype(np.int64) - img.astype(np.int64)).max()
        assert err <= near, (near, err)


def test_jpegls_lse_zero_means_default():
    """LSE preset fields with value 0 select that field's DEFAULT
    (T.87 C.2.4.1.1) — CharLS/GDCM emit e.g. MAXVAL set with thresholds
    and RESET left 0; taking the zeros literally corrupts the decode."""
    import struct as _s

    from ife_tpu.io.jpegls import decode_jpegls, encode_jpegls

    rng = np.random.default_rng(17)
    img = rng.integers(0, 1 << 12, size=(11, 9)).astype(np.uint16)
    enc = encode_jpegls(img, precision=12)
    # insert an LSE: MAXVAL = 4095 explicit, T1/T2/T3/RESET = 0 (defaults)
    lse = _s.pack(">HHB", 0xFFF8, 2 + 11, 1) + _s.pack(
        ">HHHHH", 4095, 0, 0, 0, 0)
    sof_end = 2 + 2 + 11  # SOI + SOF55 marker + (len-inclusive) segment
    patched = enc[:sof_end] + lse + enc[sof_end:]
    np.testing.assert_array_equal(decode_jpegls(patched), img)


def test_jpegls_fast_falls_back_without_native(monkeypatch):
    """decode_jpegls_fast must produce the Python decoder's result both
    through the native library and when it is unavailable."""
    from ife_tpu.io import jpegls
    from ife_tpu.io.jpegls import decode_jpegls_fast, encode_jpegls

    rng = np.random.default_rng(18)
    img = rng.integers(0, 1 << 12, size=(9, 7)).astype(np.uint16)
    enc = encode_jpegls(img, precision=12)
    np.testing.assert_array_equal(decode_jpegls_fast(enc, 9, 7), img)
    import ife_tpu.native_lib as nl

    monkeypatch.setattr(nl, "jls_decode_native", lambda *a: None)
    np.testing.assert_array_equal(decode_jpegls_fast(enc, 9, 7), img)
    monkeypatch.undo()
    # a skippable segment the NATIVE decoder rejects (0xFFCC) must fall
    # back to the Python parser, not hard-fail (second-review finding)
    import struct as _s

    odd = enc[:2] + _s.pack(">HH", 0xFFCC, 4) + b"\x00\x00" + enc[2:]
    np.testing.assert_array_equal(decode_jpegls_fast(odd, 9, 7), img)
    del jpegls


def test_jpegls_rejects_non_ls_streams():
    import struct as _s

    import pytest

    from ife_tpu.io.jpegls import decode_jpegls

    with pytest.raises(ValueError, match="SOI"):
        decode_jpegls(b"\x00\x01")
    # an SOF3 (plain JPEG lossless) stream must be rejected clearly
    sof3 = (_s.pack(">H", 0xFFD8) + _s.pack(">HH", 0xFFC3, 2 + 9)
            + _s.pack(">BHHB", 8, 4, 4, 1) + bytes([0, 0x11, 0]))
    with pytest.raises(ValueError, match="SOF55"):
        decode_jpegls(sof3)


def test_jpegll_huffman_table_classes():
    """An AC-class (Tc=1) DHT with the same table id must not clobber the
    DC table the lossless scan uses, and an SOS referencing an undefined
    table raises ValueError (not KeyError) — round-4 advisor findings."""
    import struct as _s

    import pytest

    from ife_tpu.io.jpegll import decode_jpeg_lossless, encode_jpeg_lossless

    rng = np.random.default_rng(13)
    img = rng.integers(0, 1 << 12, size=(9, 7)).astype(np.uint16)
    enc = encode_jpeg_lossless(img, precision=12)

    # insert a garbage AC-class table (Tc=1, Th=0) right after SOI: if the
    # decoder keyed tables by id alone, this segment (parsed before the
    # real DC table only if inserted later) could shadow it — insert it
    # AFTER the real DHT to exercise the overwrite direction that bit
    dht_at = enc.find(_s.pack(">H", 0xFFC4))
    assert dht_at > 0
    seglen = _s.unpack_from(">H", enc, dht_at + 2)[0]
    end = dht_at + 2 + seglen
    ac_bits = [0] * 16
    ac_bits[0] = 1  # one 1-bit code mapping to a bogus ssss
    ac_seg = bytes([0x10] + ac_bits + [15])
    ac_dht = _s.pack(">HH", 0xFFC4, 2 + len(ac_seg)) + ac_seg
    patched = enc[:end] + ac_dht + enc[end:]
    np.testing.assert_array_equal(decode_jpeg_lossless(patched), img)

    # change the real DC table's id to 1 while the SOS still references 0
    tc_th_at = dht_at + 4
    assert enc[tc_th_at] == 0x00
    broken = enc[:tc_th_at] + b"\x01" + enc[tc_th_at + 1:]
    with pytest.raises(ValueError, match="undefined Huffman table"):
        decode_jpeg_lossless(broken)
