"""End-to-end CLI tests: the full reference workflow driven through `ife`
subcommands (the reference's only API surface, SURVEY.md §1 L5)."""
import os
import struct

import numpy as np
import pytest

from ife_tpu.cli.main import main
from ife_tpu.core.volume import Volume, synthetic_ct, sphere_mask
from ife_tpu.io import read_volume, write_volume, read_rois


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    vol = synthetic_ct((32, 32, 32), seed=7)
    mask = sphere_mask((32, 32, 32), 0.42)
    write_volume(str(d / "img.nii.gz"), vol)
    write_volume(str(d / "mask.nii.gz"), mask)
    return d


def _run(*argv):
    rc = main([str(a) for a in argv])
    assert rc == 0, argv
    return rc


def test_extract_features_writes_8_channels_per_scale(workdir):
    d = workdir
    _run("extract-features", "-i", d / "img.nii.gz", "-m", d / "mask.nii.gz",
         "-o", d / "feat", "-s", "1.0")
    from ife_tpu.ops.features import FEATURE_NAMES

    for name in FEATURE_NAMES:
        path = d / f"feat_scale_1{name}.nii.gz"
        assert path.exists(), path
        v = read_volume(str(path))
        assert v.shape == (32, 32, 32)


def test_full_bag_workflow(workdir):
    d = workdir
    # pair list -> bin edges
    with open(d / "pairs.txt", "w") as f:
        f.write(f"{d/'img.nii.gz'},{d/'mask.nii.gz'}\n")
    _run("determine-bin-edges", "-l", d / "pairs.txt", "-o", d / "spec.txt",
         "-s", "1.0", "--bins", "4", "--seed", "0")
    # rois
    _run("generate-rois", "-m", d / "mask.nii.gz", "-o", d / "r.ROIInfo",
         "-n", "4", "--size", "9,9,9", "--seed", "1")
    rois = read_rois(str(d / "r.ROIInfo"))
    assert len(rois) == 4
    # bag from those rois
    _run("make-bag", "-i", d / "img.nii.gz", "-m", d / "mask.nii.gz",
         "-b", d / "spec.txt", "-o", d / "out", "-s", "1.0",
         "-r", d / "r.ROIInfo")
    bag = np.loadtxt(d / "out.bag", delimiter=",")
    assert bag.shape == (4, 8 * 4)  # 8 features x 4 bins
    # CSV text roundtrip costs ~1e-6 per element
    np.testing.assert_allclose(bag.reshape(4, 8, 4).sum(-1), 1.0, atol=5e-6)


def test_make_bag_dense_and_intensity(workdir):
    d = workdir
    with open(d / "ispec.txt", "w") as f:
        f.write("-900,-600,-300\n")
    _run("make-bag-only-intensity", "-i", d / "img.nii.gz",
         "-m", d / "mask.nii.gz", "-b", d / "ispec.txt", "-o", d / "ib",
         "-n", "3", "--roi-size", "9,9,9", "--seed", "2")
    bag = np.loadtxt(d / "ib.bag", delimiter=",")
    assert bag.shape == (3, 4)
    with open(d / "fspec.txt", "w") as f:
        for k in range(8):  # 8 features x 1 scale, 3 edges each
            f.write("-0.5,0.0,0.5\n")
    _run("make-bag-dense", "-i", d / "img.nii.gz", "-m", d / "mask.nii.gz",
         "-b", d / "fspec.txt", "-o", d / "db", "-s", "1.0",
         "--roi-size", "31,31,31")
    dbag = np.loadtxt(d / "db.bag", delimiter=",")
    assert dbag.ndim == 2 and dbag.shape[1] == 8 * 4


def test_roi_label_and_sample_tools(workdir):
    d = workdir
    _run("sample-rois", "-i", d / "img.nii.gz", "-r", d / "r.ROIInfo",
         "-o", d / "samples.csv")
    m = np.loadtxt(d / "samples.csv", delimiter=",")
    assert m.shape == (4, 9 * 9 * 9)
    _run("extract-labels", "-l", d / "mask.nii.gz", "-r", d / "r.ROIInfo",
         "-o", d / "labels.txt")
    labels = [int(x) for x in open(d / "labels.txt").read().split()]
    assert len(labels) == 4


def test_image_utility_tools(workdir):
    d = workdir
    _run("masked-image-filter", "-i", d / "img.nii.gz", "-m", d / "mask.nii.gz",
         "-o", d / "masked.nii.gz", "--outside", "-1000")
    mv = read_volume(str(d / "masked.nii.gz"))
    mask = read_volume(str(d / "mask.nii.gz"))
    assert np.all(np.asarray(mv.data)[np.asarray(mask.data) == 0] == -1000)

    _run("extract-masked-region", "-m", d / "mask.nii.gz",
         "-o", d / "relabel.nii.gz", "--include", "1", "--inside", "7")
    rv = read_volume(str(d / "relabel.nii.gz"))
    assert set(np.unique(np.asarray(rv.data))) <= {0, 7}

    _run("extract-bounding-box", "-i", d / "img.nii.gz",
         "-m", d / "mask.nii.gz", "-o", d / "bbox.nii.gz")
    bv = read_volume(str(d / "bbox.nii.gz"))
    assert all(s <= 32 for s in bv.shape) and all(s > 0 for s in bv.shape)

    _run("extract-slices", "-i", d / "img.nii.gz", "-o", d / "slice",
         "--axis", "2", "--fractions", "0.5")
    assert (d / "slice_16.nii.gz").exists()

    _run("pad-image", "-i", d / "slice_16.nii.gz", "-o", d / "padded.nii.gz",
         "--size", "48,48")
    pv = read_volume(str(d / "padded.nii.gz"))
    assert pv.shape[:2] == (48, 48)

    _run("extract-window", "-i", d / "slice_16.nii.gz", "-o", d / "win.nii.gz",
         "--out-spacing", "0.5")
    wv = read_volume(str(d / "win.nii.gz"))
    assert np.asarray(wv.data).max() <= 255

    _run("resample", "-s", d / "img.nii.gz", "-t", d / "bbox.nii.gz",
         "-o", d / "resampled.nii.gz")
    rsv = read_volume(str(d / "resampled.nii.gz"))
    assert rsv.shape == bv.shape


def test_converters_and_browser(workdir, capsys):
    d = workdir
    from ife_tpu.io import write_hr2, write_octave

    vol = read_volume(str(d / "img.nii.gz"))
    write_hr2(str(d / "v.hr2"), vol)
    _run("convert-hr2", d / "v.hr2", d / "from_hr2.nii.gz")
    hv = read_volume(str(d / "from_hr2.nii.gz"))
    np.testing.assert_allclose(np.asarray(hv.data), np.asarray(vol.data))

    write_octave(str(d / "v.mat"), vol)
    _run("convert-from-octave", d / "v.mat", d / "from_oct.nii.gz")
    ov = read_volume(str(d / "from_oct.nii.gz"))
    np.testing.assert_allclose(np.asarray(ov.data), np.asarray(vol.data))

    _run("image-browser", "-i", d / "img.nii.gz", "--cmd", "info")
    out = capsys.readouterr().out
    assert "shape: (32, 32, 32)" in out


def test_gradient_and_normalized_convolution(workdir):
    d = workdir
    _run("gradient-features", "-i", d / "img.nii.gz", "-m", d / "mask.nii.gz",
         "-o", d / "gm.nii.gz")
    gv = read_volume(str(d / "gm.nii.gz"))
    assert np.all(np.asarray(gv.data) >= 0)

    _run("masked-normalized-convolution", "-i", d / "img.nii.gz",
         "-c", d / "mask.nii.gz", "-o", str(d / "nc"), "-s", "1.5",
         "--mask-output")
    nv = read_volume(str(d / "ncscale_1.5.nii.gz"))
    assert np.all(np.isfinite(np.asarray(nv.data)))


def test_cli_error_paths(workdir, capsys):
    d = workdir
    rc = main(["make-bag", "-i", str(d / "img.nii.gz"),
               "-m", str(d / "mask.nii.gz"), "-b", str(d / "missing.txt"),
               "-o", str(d / "x"), "-s", "1.0"])
    assert rc == 1
    assert "error" in capsys.readouterr().err


# ---------------------------------------------------------------------------
# minimal DICOM: synthesize explicit-VR-LE files, convert, check naming
# ---------------------------------------------------------------------------

def _dicom_bytes(z, uid=b"1.2.3.4", rows=4, cols=4):
    def elem(group, el, vr, value: bytes):
        if len(value) % 2:
            value += b" " if vr != b"OW" else b"\x00"
        if vr in (b"OB", b"OW", b"SQ", b"UT", b"UN", b"OF"):
            return struct.pack("<HH2sHI", group, el, vr, 0, len(value)) + value
        return struct.pack("<HH2sH", group, el, vr, len(value)) + value

    meta = elem(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1")
    pix = (np.arange(rows * cols, dtype=np.int16) + z * 100).tobytes()
    body = b"".join([
        elem(0x0008, 0x0020, b"DA", b"20260817"),
        elem(0x0010, 0x0020, b"LO", b"PAT1"),
        elem(0x0018, 0x0050, b"DS", b"2.5"),
        elem(0x0018, 0x1210, b"SH", b"B30f"),
        elem(0x0020, 0x000E, b"UI", uid),
        elem(0x0020, 0x0032, b"DS", f"0\\0\\{z * 2.5:g}".encode()),
        elem(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        elem(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        elem(0x0028, 0x0030, b"DS", b"0.7\\0.7"),
        elem(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        elem(0x0028, 0x0103, b"US", struct.pack("<H", 1)),
        elem(0x0028, 0x1052, b"DS", b"-1024"),
        elem(0x0028, 0x1053, b"DS", b"1"),
        elem(0x7FE0, 0x0010, b"OW", pix),
    ])
    return b"\x00" * 128 + b"DICM" + meta + body


def test_convert_dicom(workdir):
    d = workdir
    dcm = d / "dicom"
    os.makedirs(dcm, exist_ok=True)
    for z in range(3):
        with open(dcm / f"slice{z}.dcm", "wb") as f:
            f.write(_dicom_bytes(z))
    _run("convert-dicom", "-d", dcm, "-o", d / "dcm_out")
    outs = os.listdir(d / "dcm_out")
    assert len(outs) == 1
    assert outs[0] == "PAT1_20260817_B30f_2.5.nii.gz"
    v = read_volume(str(d / "dcm_out" / outs[0]))
    assert v.shape == (4, 4, 3)
    # NIfTI pixdim is float32; compare approximately
    np.testing.assert_allclose(v.spacing, (0.7, 0.7, 2.5), rtol=1e-6)
    # rescale applied: first voxel of slice 0 = 0*1 + (-1024)
    data = np.asarray(v.data)
    assert data[0, 0, 0] == -1024.0
    # slices ordered by z: slice 2's values offset by +200
    assert data[0, 0, 2] == -1024.0 + 200.0


def test_merge_bags(workdir):
    d = workdir
    import numpy as np
    np.savetxt(d / "b1.bag", np.random.default_rng(0).random((3, 6)), delimiter=",")
    np.savetxt(d / "b2.bag", np.random.default_rng(1).random((2, 6)), delimiter=",")
    np.savetxt(d / "blabels.csv", np.array([[1.0], [0.0]]), delimiter=",")
    _run("merge-bags", "-b", d / "b1.bag", d / "b2.bag",
         "-o", d / "ds.npz", "--bag-labels", d / "blabels.csv")
    from ife_tpu.roi.bagged_dataset import load_bagged_dataset
    ds = load_bagged_dataset(str(d / "ds.npz"))
    assert ds["instances"].shape == (5, 6)
    assert list(ds["bag_index"]) == [0, 0, 0, 1, 1]
    assert ds["bag_labels"].tolist() == [[1.0], [0.0]]
    assert list(ds["bag_names"]) == ["b1.bag", "b2.bag"]


def test_hessian_features(workdir):
    d = workdir
    _run("hessian-features", "-i", d / "img.nii.gz", "-m", d / "mask.nii.gz",
         "-o", d / "hf")
    v = read_volume(str(d / "hfFrobeniusNorm.nii.gz"))
    assert v.shape == (32, 32, 32)
    assert np.all(np.asarray(v.data) >= 0)
    mask = read_volume(str(d / "mask.nii.gz"))
    assert np.all(np.asarray(v.data)[np.asarray(mask.data) == 0] == 0)


def test_extract_features_sharded_matches_unsharded(workdir):
    d = workdir
    _run("extract-features", "-i", d / "img.nii.gz", "-m", d / "mask.nii.gz",
         "-o", d / "unsh", "-s", "1.0")
    _run("extract-features", "-i", d / "img.nii.gz", "-m", d / "mask.nii.gz",
         "-o", d / "sh", "-s", "1.0", "--sharded")
    for name in ("GaussianBlur", "FrobeniusNorm"):
        a = read_volume(str(d / f"sh_scale_1{name}.nii.gz"))
        b = read_volume(str(d / f"unsh_scale_1{name}.nii.gz"))
        # f32: sharded/unsharded differ by summation-order ulps
        np.testing.assert_allclose(np.asarray(a.data), np.asarray(b.data),
                                   rtol=1e-5, atol=1e-3)


def test_sharded_cli_workflow_with_manifest_restart(workdir, capsys):
    """The distributed product path (VERDICT round 1, item 3): the
    reference pipeline's §3.2/§3.3 stages run --sharded over the device
    mesh, and a --manifest restart skips completed blocks. Self-contained:
    builds its own single-device outputs to compare against."""
    d = workdir
    # single-device references for every stage
    _run("extract-features", "-i", d / "img.nii.gz", "-m", d / "mask.nii.gz",
         "-o", d / "hfeat", "-s", "1.0")
    with open(d / "spairs.txt", "w") as f:
        f.write(f"{d/'img.nii.gz'},{d/'mask.nii.gz'}\n")
    _run("determine-bin-edges", "-l", d / "spairs.txt", "-o", d / "hspec.txt",
         "-s", "1.0", "--bins", "4", "--seed", "0")
    _run("generate-rois", "-m", d / "mask.nii.gz", "-o", d / "sr.ROIInfo",
         "-n", "4", "--size", "9,9,9", "--seed", "1")
    _run("make-bag", "-i", d / "img.nii.gz", "-m", d / "mask.nii.gz",
         "-b", d / "hspec.txt", "-o", d / "hbag", "-s", "1.0",
         "-r", d / "sr.ROIInfo")

    # --- extract-features --sharded --manifest ---
    man = d / "run.manifest.json"
    _run("extract-features", "-i", d / "img.nii.gz", "-m", d / "mask.nii.gz",
         "-o", d / "sfeat", "-s", "1.0", "--sharded", "--manifest", man)
    from ife_tpu.ops.features import FEATURE_NAMES

    single = read_volume(str(d / "hfeat_scale_1GaussianBlur.nii.gz"))
    shard = read_volume(str(d / "sfeat_scale_1GaussianBlur.nii.gz"))
    np.testing.assert_allclose(shard.numpy(), single.numpy(), atol=1e-5)
    assert man.exists()
    # restart: completed scale is skipped (manifest), new scale runs
    capsys.readouterr()
    _run("extract-features", "-i", d / "img.nii.gz", "-m", d / "mask.nii.gz",
         "-o", d / "sfeat", "-s", "1.0", "1.3", "--sharded",
         "--manifest", man)
    out = capsys.readouterr().out
    assert "Skipping completed scale 1 (manifest)" in out
    assert "Processing scale 1.3" in out
    assert (d / f"sfeat_scale_1.3{FEATURE_NAMES[0]}.nii.gz").exists()

    # --- determine-bin-edges --sharded (+ per-image histogram cache) ---
    eman = d / "edges.manifest.json"
    _run("determine-bin-edges", "-l", d / "spairs.txt", "-o", d / "sspec.txt",
         "-s", "1.0", "--bins", "4", "--sharded", "--fine-bins", "1024",
         "--manifest", eman)
    from ife_tpu.io import read_hist_spec

    exact = read_hist_spec(str(d / "hspec.txt"))    # host sort path
    approx = read_hist_spec(str(d / "sspec.txt"))   # scalable path
    assert len(approx) == 8
    for e_ex, e_ap in zip(exact, approx):
        span = max(e_ex[-1] - e_ex[0], 1e-9)
        np.testing.assert_allclose(e_ap, e_ex, atol=0.1 * span)
    # restart consumes the cached per-image histograms
    capsys.readouterr()
    _run("determine-bin-edges", "-l", d / "spairs.txt", "-o", d / "sspec.txt",
         "-s", "1.0", "--bins", "4", "--sharded", "--fine-bins", "1024",
         "--manifest", eman)
    assert "Loading cached histograms" in capsys.readouterr().out

    # --- make-bag --sharded: bag matches the host bag on the same ROIs ---
    _run("make-bag", "-i", d / "img.nii.gz", "-m", d / "mask.nii.gz",
         "-b", d / "hspec.txt", "-o", d / "sbag", "-s", "1.0",
         "-r", d / "sr.ROIInfo", "--sharded")
    want = np.loadtxt(d / "hbag.bag", delimiter=",")
    got = np.loadtxt(d / "sbag.bag", delimiter=",")
    # equalized edges ARE sampled feature values, so a 1-ulp f32 difference
    # between the sharded and single-device feature pass can flip a voxel
    # across a bin boundary: one flip moves 1/|ROI∩mask| ≈ 1/729 of mass
    # (strict value parity is test_parallel's make_bag_sharded test, which
    # uses tie-free random edges at 1e-6)
    assert np.abs(got - want).max() < 3.5e-3
    np.testing.assert_allclose(got.sum(axis=1), want.sum(axis=1), atol=1e-4)


def _rle_encode_segment(data: bytes) -> bytes:
    # simple PackBits encoder: literal runs of <=128 bytes (valid, if not
    # maximally compressed)
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i:i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def _dicom_rle_bytes(z, uid=b"1.2.3.9", rows=4, cols=4):
    # RLE Lossless (1.2.840.10008.1.2.5): encapsulated PixelData with a
    # Basic Offset Table item + one frame item (64-byte RLE header + two
    # PackBits byte-plane segments, MSB first)
    def elem(group, el, vr, value: bytes):
        if len(value) % 2:
            value += b" "
        if vr in (b"OB", b"OW", b"SQ", b"UT", b"UN", b"OF"):
            return struct.pack("<HH2sHI", group, el, vr, 0, len(value)) + value
        return struct.pack("<HH2sH", group, el, vr, len(value)) + value

    meta = elem(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.5")
    pix = (np.arange(rows * cols, dtype=np.int16) + z * 100)
    hi = _rle_encode_segment(((pix.view(np.uint16) >> 8) & 0xFF
                              ).astype(np.uint8).tobytes())
    lo = _rle_encode_segment((pix.view(np.uint16) & 0xFF
                              ).astype(np.uint8).tobytes())
    if len(hi) % 2:
        hi += b"\x00"
    header = struct.pack("<16I", 2, 64, 64 + len(hi), *([0] * 13))
    frame = header + hi + lo
    if len(frame) % 2:
        frame += b"\x00"
    encap = (
        struct.pack("<HHI", 0xFFFE, 0xE000, 0)          # empty offset table
        + struct.pack("<HHI", 0xFFFE, 0xE000, len(frame)) + frame
        + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)        # sequence delimiter
    )
    pixel_elem = struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0,
                             0xFFFFFFFF) + encap
    body = b"".join([
        elem(0x0008, 0x0020, b"DA", b"20260817"),
        elem(0x0010, 0x0020, b"LO", b"PAT2"),
        elem(0x0018, 0x0050, b"DS", b"2.5"),
        elem(0x0018, 0x1210, b"SH", b"B30f"),
        elem(0x0020, 0x000E, b"UI", uid),
        elem(0x0020, 0x0032, b"DS", f"0\\0\\{z * 2.5:g}".encode()),
        elem(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        elem(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        elem(0x0028, 0x0030, b"DS", b"0.7\\0.7"),
        elem(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        elem(0x0028, 0x0103, b"US", struct.pack("<H", 1)),
        elem(0x0028, 0x1052, b"DS", b"-1024"),
        elem(0x0028, 0x1053, b"DS", b"1"),
        pixel_elem,
    ])
    return b"\x00" * 128 + b"DICM" + meta + body


def test_convert_dicom_rle(workdir):
    # RLE Lossless round-trip must decode to the SAME volume as the
    # uncompressed syntax (reference ConvertDICOM capability via GDCM,
    # ConvertDICOM.cxx:70-84)
    d = workdir
    dcm = d / "dicom_rle"
    os.makedirs(dcm, exist_ok=True)
    for z in range(3):
        with open(dcm / f"slice{z}.dcm", "wb") as f:
            f.write(_dicom_rle_bytes(z))
    _run("convert-dicom", "-d", dcm, "-o", d / "dcm_rle_out")
    outs = os.listdir(d / "dcm_rle_out")
    assert outs == ["PAT2_20260817_B30f_2.5.nii.gz"]
    v = read_volume(str(d / "dcm_rle_out" / outs[0]))
    assert v.shape == (4, 4, 3)
    data = np.asarray(v.data)
    assert data[0, 0, 0] == -1024.0
    assert data[0, 0, 2] == -1024.0 + 200.0
    # values identical to the uncompressed encoding of the same series
    want = (np.arange(16, dtype=np.int16).reshape(4, 4) - 1024).astype(
        np.float32)
    np.testing.assert_array_equal(data[..., 0], want.T)


def _dicom_jpegll_bytes(z, uid=b"1.2.3.11", rows=4, cols=4):
    # JPEG Lossless SV1 (1.2.840.10008.1.2.4.70): encapsulated PixelData
    # holding one SOF3 frame produced by the in-repo encoder
    from ife_tpu.io.jpegll import encode_jpeg_lossless

    def elem(group, el, vr, value: bytes):
        if len(value) % 2:
            value += b" "
        if vr in (b"OB", b"OW", b"SQ", b"UT", b"UN", b"OF"):
            return struct.pack("<HH2sHI", group, el, vr, 0, len(value)) + value
        return struct.pack("<HH2sH", group, el, vr, len(value)) + value

    meta = elem(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.4.70")
    pix = (np.arange(rows * cols, dtype=np.int16) + z * 100)
    frame = encode_jpeg_lossless(
        pix.view(np.uint16).reshape(rows, cols), precision=16)
    if len(frame) % 2:
        frame += b"\x00"
    encap = (
        struct.pack("<HHI", 0xFFFE, 0xE000, 0)
        + struct.pack("<HHI", 0xFFFE, 0xE000, len(frame)) + frame
        + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    )
    pixel_elem = struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0,
                             0xFFFFFFFF) + encap
    body = b"".join([
        elem(0x0008, 0x0020, b"DA", b"20260817"),
        elem(0x0010, 0x0020, b"LO", b"PAT3"),
        elem(0x0018, 0x0050, b"DS", b"2.5"),
        elem(0x0018, 0x1210, b"SH", b"B30f"),
        elem(0x0020, 0x000E, b"UI", uid),
        elem(0x0020, 0x0032, b"DS", f"0\\0\\{z * 2.5:g}".encode()),
        elem(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        elem(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        elem(0x0028, 0x0030, b"DS", b"0.7\\0.7"),
        elem(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        elem(0x0028, 0x0103, b"US", struct.pack("<H", 1)),
        elem(0x0028, 0x1052, b"DS", b"-1024"),
        elem(0x0028, 0x1053, b"DS", b"1"),
        pixel_elem,
    ])
    return b"\x00" * 128 + b"DICM" + meta + body


def test_convert_dicom_jpeg_lossless_fragmented_frame(workdir):
    """A single JPEG frame MAY be split across several encapsulated
    fragments (PS3.5 A.4) — the reader must join them (round-4 review
    finding: the RLE-era 'last fragment is the frame' rule broke here)."""
    from ife_tpu.io.dicom import read_dicom_series

    raw = _dicom_jpegll_bytes(0)
    # split the frame item into two fragments: rebuild the encapsulation
    from ife_tpu.io.jpegll import encode_jpeg_lossless

    pix = np.arange(16, dtype=np.int16)
    frame = encode_jpeg_lossless(pix.view(np.uint16).reshape(4, 4),
                                 precision=16)
    if len(frame) % 2:
        frame += b"\x00"
    cut = (len(frame) // 2) & ~1  # even split point
    f1, f2 = frame[:cut], frame[cut:]
    encap = (
        struct.pack("<HHI", 0xFFFE, 0xE000, 0)
        + struct.pack("<HHI", 0xFFFE, 0xE000, len(f1)) + f1
        + struct.pack("<HHI", 0xFFFE, 0xE000, len(f2)) + f2
        + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    )
    # splice the two-fragment encapsulation into the single-frame file
    single = (
        struct.pack("<HHI", 0xFFFE, 0xE000, 0)
        + struct.pack("<HHI", 0xFFFE, 0xE000, len(frame)) + frame
        + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    )
    assert single in raw
    frag = raw.replace(single, encap)
    p = workdir / "frag.dcm"
    with open(p, "wb") as f:
        f.write(frag)
    vol, _tags = read_dicom_series([str(p)])
    want = (pix.reshape(4, 4) - 1024).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(vol.data)[..., 0], want.T)


def test_convert_dicom_jpeg_lossless(workdir):
    # JPEG Lossless SV1 must decode to the SAME volume as the uncompressed
    # syntax (reference ConvertDICOM reads it through GDCM,
    # ConvertDICOM.cxx:70-84)
    d = workdir
    dcm = d / "dicom_jll"
    os.makedirs(dcm, exist_ok=True)
    for z in range(3):
        with open(dcm / f"slice{z}.dcm", "wb") as f:
            f.write(_dicom_jpegll_bytes(z))
    _run("convert-dicom", "-d", dcm, "-o", d / "dcm_jll_out")
    outs = os.listdir(d / "dcm_jll_out")
    assert outs == ["PAT3_20260817_B30f_2.5.nii.gz"]
    v = read_volume(str(d / "dcm_jll_out" / outs[0]))
    assert v.shape == (4, 4, 3)
    data = np.asarray(v.data)
    assert data[0, 0, 0] == -1024.0
    assert data[0, 0, 2] == -1024.0 + 200.0
    want = (np.arange(16, dtype=np.int16).reshape(4, 4) - 1024).astype(
        np.float32)
    np.testing.assert_array_equal(data[..., 0], want.T)


def _dicom_jpegls_bytes(z, uid=b"1.2.3.12", rows=4, cols=4):
    # JPEG-LS Lossless (1.2.840.10008.1.2.4.80): encapsulated PixelData
    # holding one T.87 frame produced by the in-repo encoder
    from ife_tpu.io.jpegls import encode_jpegls

    def elem(group, el, vr, value: bytes):
        if len(value) % 2:
            value += b" "
        if vr in (b"OB", b"OW", b"SQ", b"UT", b"UN", b"OF"):
            return struct.pack("<HH2sHI", group, el, vr, 0, len(value)) + value
        return struct.pack("<HH2sH", group, el, vr, len(value)) + value

    meta = elem(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.4.80")
    pix = (np.arange(rows * cols, dtype=np.int16) + z * 100)
    frame = encode_jpegls(
        pix.view(np.uint16).reshape(rows, cols), precision=16)
    if len(frame) % 2:
        frame += b"\x00"
    encap = (
        struct.pack("<HHI", 0xFFFE, 0xE000, 0)
        + struct.pack("<HHI", 0xFFFE, 0xE000, len(frame)) + frame
        + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    )
    pixel_elem = struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0,
                             0xFFFFFFFF) + encap
    body = b"".join([
        elem(0x0008, 0x0020, b"DA", b"20260817"),
        elem(0x0010, 0x0020, b"LO", b"PAT4"),
        elem(0x0018, 0x0050, b"DS", b"2.5"),
        elem(0x0018, 0x1210, b"SH", b"B30f"),
        elem(0x0020, 0x000E, b"UI", uid),
        elem(0x0020, 0x0032, b"DS", f"0\\0\\{z * 2.5:g}".encode()),
        elem(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        elem(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        elem(0x0028, 0x0030, b"DS", b"0.7\\0.7"),
        elem(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        elem(0x0028, 0x0103, b"US", struct.pack("<H", 1)),
        elem(0x0028, 0x1052, b"DS", b"-1024"),
        elem(0x0028, 0x1053, b"DS", b"1"),
        pixel_elem,
    ])
    return b"\x00" * 128 + b"DICM" + meta + body


def test_convert_dicom_jpegls(workdir):
    # JPEG-LS Lossless must decode to the SAME volume as the uncompressed
    # syntax (the reference reads it through GDCM's CharLS,
    # ConvertDICOM.cxx:70-84)
    d = workdir
    dcm = d / "dicom_jls"
    os.makedirs(dcm, exist_ok=True)
    for z in range(3):
        with open(dcm / f"slice{z}.dcm", "wb") as f:
            f.write(_dicom_jpegls_bytes(z))
    _run("convert-dicom", "-d", dcm, "-o", d / "dcm_jls_out")
    outs = os.listdir(d / "dcm_jls_out")
    assert outs == ["PAT4_20260817_B30f_2.5.nii.gz"]
    v = read_volume(str(d / "dcm_jls_out" / outs[0]))
    assert v.shape == (4, 4, 3)
    data = np.asarray(v.data)
    assert data[0, 0, 0] == -1024.0
    assert data[0, 0, 2] == -1024.0 + 200.0
    want = (np.arange(16, dtype=np.int16).reshape(4, 4) - 1024).astype(
        np.float32)
    np.testing.assert_array_equal(data[..., 0], want.T)


def test_unsupported_transfer_syntax_message(workdir):
    from ife_tpu.io.dicom import read_dicom_file

    # JPEG 2000 (.4.90) stays unsupported; the error must name the
    # supported list (same length as the RLE UID + pad so the element
    # length stays valid)
    jpeg = _dicom_rle_bytes(0)
    jpeg = jpeg.replace(b"1.2.840.10008.1.2.5 ", b"1.2.840.10008.1.2.4.")
    p = workdir / "bad.dcm"
    with open(p, "wb") as f:
        f.write(jpeg)
    import pytest
    with pytest.raises(ValueError, match="supported:"):
        read_dicom_file(str(p))
