"""Bit-exactness of the native (libcvtpre) preprocessing path vs PIL.

The native loader (csrc/preproc + data/native.py) must be sample-for-sample
interchangeable with the pure-PIL pipeline — these tests assert byte
equality for every op (decode, resize, luma, rot90, flip, normalise) and for
every assembled sample the three loaders produce, plus the per-sample PIL
fallback on containers outside the fast path (16-bit PNG).

Builds the library on demand (make -C csrc/preproc) and skips when no
toolchain is available.
"""

import io
import os
import subprocess

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure_built():
    so = os.path.join(REPO, "csrc", "preproc", "libcvtpre.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", os.path.join(REPO, "csrc", "preproc")],
                check=True, capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, FileNotFoundError):
            return False
    return os.path.exists(so)


if not _ensure_built():  # pragma: no cover
    pytest.skip("native preproc library unavailable", allow_module_level=True)

from camouflaged_vlm_tpu.data import native as nat  # noqa: E402
from camouflaged_vlm_tpu.data import native_pipeline as npp  # noqa: E402
from camouflaged_vlm_tpu.data import transforms as T  # noqa: E402
from camouflaged_vlm_tpu.data.loader import _load_eval_sample  # noqa: E402
from camouflaged_vlm_tpu.data.ovcamo import OVCamoSample  # noqa: E402

if not nat.available():  # pragma: no cover
    pytest.skip("libcvtpre failed to load", allow_module_level=True)

RNG = np.random.default_rng(7)


def _png(arr, **kw):
    im = Image.fromarray(arr) if isinstance(arr, np.ndarray) else arr
    buf = io.BytesIO()
    im.save(buf, "PNG", **kw)
    return buf.getvalue()


def _jpg(arr, quality=85):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


# ---------------------------------------------------------------- decode

def test_decode_png_rgb_exact():
    arr = RNG.integers(0, 256, (37, 53, 3), np.uint8)
    assert np.array_equal(nat.decode(_png(arr), 3), arr)
    ref_l = np.asarray(Image.open(io.BytesIO(_png(arr))).convert("L"))
    assert np.array_equal(nat.decode(_png(arr), 1)[:, :, 0], ref_l)


def test_decode_png_gray_palette_rgba():
    gray = RNG.integers(0, 256, (20, 31), np.uint8)
    data = _png(gray)
    assert np.array_equal(nat.decode(data, 1)[:, :, 0], gray)
    ref_rgb = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert np.array_equal(nat.decode(data, 3), ref_rgb)

    # palette PNG: PIL convert("RGB") expands the palette
    pal = Image.fromarray(RNG.integers(0, 256, (16, 17, 3), np.uint8)).convert(
        "P", palette=Image.ADAPTIVE
    )
    data = _png(pal)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert np.array_equal(nat.decode(data, 3), ref)

    # RGBA: convert("RGB") DROPS alpha without blending
    rgba = RNG.integers(0, 256, (12, 19, 4), np.uint8)
    data = _png(Image.fromarray(rgba, "RGBA"))
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert np.array_equal(nat.decode(data, 3), ref)


def test_decode_jpeg_rgb_and_gray_exact():
    arr = RNG.integers(0, 256, (48, 64, 3), np.uint8)
    data = _jpg(arr)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert np.array_equal(nat.decode(data, 3), ref)
    ref_l = np.asarray(Image.open(io.BytesIO(data)).convert("L"))
    assert np.array_equal(nat.decode(data, 1)[:, :, 0], ref_l)

    gray = RNG.integers(0, 256, (33, 27), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(gray, "L").save(buf, "JPEG", quality=92)
    ref_l = np.asarray(Image.open(io.BytesIO(buf.getvalue())))
    assert np.array_equal(nat.decode(buf.getvalue(), 1)[:, :, 0], ref_l)
    ref_rgb = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    assert np.array_equal(nat.decode(buf.getvalue(), 3), ref_rgb)


def test_decode_16bit_png_falls_back():
    arr = (RNG.integers(0, 65536, (8, 9), np.int32)).astype(np.uint16)
    im = Image.fromarray(arr.astype(np.int32), mode="I")
    assert nat.decode(_png(im), 1) is None


# ---------------------------------------------------------------- resize

@pytest.mark.parametrize(
    "filt,pil",
    [(nat.NEAREST, Image.NEAREST),
     (nat.BILINEAR, Image.BILINEAR),
     (nat.BICUBIC, Image.BICUBIC)],
)
def test_resize_parity_fuzz(filt, pil):
    for _ in range(25):
        sw, sh = int(RNG.integers(3, 700)), int(RNG.integers(3, 700))
        dw, dh = int(RNG.integers(3, 1100)), int(RNG.integers(3, 1100))
        ch = int(RNG.choice([1, 3]))
        src = RNG.integers(0, 256, (sh, sw, ch), np.uint8)
        pim = Image.fromarray(src[:, :, 0] if ch == 1 else src)
        ref = np.asarray(pim.resize((dw, dh), pil))
        got = nat.resize(src, (dw, dh), filt)
        if ch == 1:
            got = got[:, :, 0]
        assert np.array_equal(got, ref), (filt, ch, sw, sh, dw, dh)


def test_resize_production_shapes_exact():
    # the exact shapes the pipeline uses: ->1024 bilinear, ->1024 nearest,
    # shorter-side 336 bicubic (both orientations + the boundary-pixel case
    # 640x480 that tripped the closed-form nearest rule)
    for (sw, sh) in [(640, 480), (480, 640), (1023, 767), (336, 336)]:
        src = RNG.integers(0, 256, (sh, sw, 3), np.uint8)
        pim = Image.fromarray(src)
        for dw, dh, nf, pf in [
            (1024, 1024, nat.BILINEAR, Image.BILINEAR),
            (1024, 1024, nat.NEAREST, Image.NEAREST),
            (336, 252 if sw > sh else 448, nat.BICUBIC, Image.BICUBIC),
        ]:
            ref = np.asarray(pim.resize((dw, dh), pf))
            assert np.array_equal(nat.resize(src, (dw, dh), nf), ref)


# ---------------------------------------------------------------- pix ops

def test_pixops_parity():
    arr = RNG.integers(0, 256, (41, 29, 3), np.uint8)
    im = Image.fromarray(arr)
    assert np.array_equal(nat.rgb2l(arr), np.asarray(im.convert("L")))
    assert np.array_equal(nat.rot90ccw(arr), np.rot90(arr))
    assert np.array_equal(
        nat.fliplr(arr), np.asarray(im.transpose(Image.FLIP_LEFT_RIGHT))
    )
    ref = (arr.astype(np.float32) / 255.0 - T.IMAGENET_MEAN) / T.IMAGENET_STD
    assert np.array_equal(nat.normalize(arr, T.IMAGENET_MEAN, T.IMAGENET_STD), ref)


# ------------------------------------------------- assembled transforms

def _rand_img_mask(w, h, mw=None, mh=None):
    img = RNG.integers(0, 256, (h, w, 3), np.uint8)
    mw, mh = mw or w, mh or h
    mask = ((RNG.random((mh, mw)) > 0.5) * 255).astype(np.uint8)
    return img, mask


def test_transform_parity_on_arrays():
    img, mask = _rand_img_mask(123, 87)
    pimg, pmask = Image.fromarray(img), Image.fromarray(mask, "L")
    assert np.array_equal(
        npp.sam_image_transform(img, 64), T.sam_image_transform(pimg, 64)
    )
    assert np.array_equal(
        npp.mask_to_target(mask[:, :, None], 64), T.mask_to_target(pmask, 64)
    )
    assert np.array_equal(
        npp.clip_image_transform(img, 56), T.clip_image_transform(pimg, 56)
    )
    assert np.array_equal(
        npp.clip_image_resized_u8(img, 56), T.clip_image_resized_u8(pimg, 56)
    )
    assert np.array_equal(
        npp.clip_alpha_transform(mask[:, :, None], 56),
        T.clip_alpha_transform(pmask, 56),
    )
    assert np.array_equal(
        npp.sam_image_resized_u8(img, 64), T.sam_image_resized_u8(pimg, 64)
    )


def _write_sample(tmp_path, img, mask, i=0, img_fmt="JPEG"):
    ip = str(tmp_path / f"img{i}.{'jpg' if img_fmt == 'JPEG' else 'png'}")
    mp = str(tmp_path / f"mask{i}.png")
    Image.fromarray(img).save(ip, img_fmt)
    Image.fromarray(mask, "L").save(mp, "PNG")
    return OVCamoSample(
        class_label="cat", class_id=3, image_path=ip, mask_path=mp
    )


def test_eval_sample_native_equals_pil(tmp_path):
    img, mask = _rand_img_mask(130, 100)
    s = _write_sample(tmp_path, img, mask)
    for raw in (False, True):
        a = _load_eval_sample(s, 64, 56, raw_uint8=raw, use_native=True)
        b = _load_eval_sample(s, 64, 56, raw_uint8=raw, use_native=False)
        assert np.array_equal(a.inp, b.inp) and a.inp.dtype == b.inp.dtype
        assert np.array_equal(a.gt, b.gt)
        assert np.array_equal(a.clip_image, b.clip_image)
        assert (a.clip_mask is None) == (b.clip_mask is None)
        if a.clip_mask is not None:
            assert np.array_equal(a.clip_mask, b.clip_mask)
        assert a.orig_size == b.orig_size == (100, 130)


def test_eval_sample_rot90_mismatch(tmp_path):
    # size-mismatched image triggers the reference's rot90 fixup
    img, _ = _rand_img_mask(100, 130)
    _, mask = _rand_img_mask(130, 100)
    s = _write_sample(tmp_path, img, mask, i=1)
    a = _load_eval_sample(s, 64, 56, use_native=True)
    b = _load_eval_sample(s, 64, 56, use_native=False)
    assert np.array_equal(a.inp, b.inp)
    assert np.array_equal(a.clip_image, b.clip_image)


def test_eval_sample_16bit_png_fallback(tmp_path):
    # image is a 16-bit PNG -> native decode refuses -> PIL fallback, still
    # produces a sample identical to the pure-PIL path
    img16 = RNG.integers(0, 65535, (40, 50), np.int32)
    ip = str(tmp_path / "img16.png")
    Image.fromarray(img16, mode="I").save(ip)
    mask = ((RNG.random((40, 50)) > 0.5) * 255).astype(np.uint8)
    mp = str(tmp_path / "mask16.png")
    Image.fromarray(mask, "L").save(mp)
    s = OVCamoSample(class_label="c", class_id=0, image_path=ip, mask_path=mp)
    a = _load_eval_sample(s, 64, 56, use_native=True)
    b = _load_eval_sample(s, 64, 56, use_native=False)
    assert np.array_equal(a.inp, b.inp)
    assert np.array_equal(a.clip_image, b.clip_image)


def test_train_batches_native_equals_pil(tmp_path, monkeypatch):
    """iter_train_batches must produce IDENTICAL batches with the native path
    on and off (same seed => same order/flips; outputs bit-equal)."""
    import json

    from camouflaged_vlm_tpu.data import loader as L
    from camouflaged_vlm_tpu.data.ovcamo import OVCamoIndex

    samples = [
        _write_sample(tmp_path, *_rand_img_mask(90 + 7 * i, 70 + 5 * i), i=i)
        for i in range(4)
    ]
    index = OVCamoIndex(split="train", classes=["cat"], samples=samples)

    def run(native):
        monkeypatch.setenv("CVLM_NATIVE_PREPROC", "1" if native else "0")
        rng = np.random.default_rng(11)
        return list(L.iter_train_batches(index, 2, rng, inp_size=64,
                                         clip_size=56, num_workers=2))

    a, b = run(True), run(False)
    assert len(a) == len(b) == 2
    for ba, bb in zip(a, b):
        for k in ba:
            assert np.array_equal(ba[k], bb[k]), k

    def run_maple(native):
        monkeypatch.setenv("CVLM_NATIVE_PREPROC", "1" if native else "0")
        rng = np.random.default_rng(11)
        return list(L.iter_maple_train_batches(index, 2, rng, clip_size=56,
                                               num_workers=2))

    for ba, bb in zip(run_maple(True), run_maple(False)):
        for k in ba:
            assert np.array_equal(ba[k], bb[k]), k
