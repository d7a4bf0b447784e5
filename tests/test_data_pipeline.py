"""Data pipeline + end-to-end eval integration test on a synthetic OVCamo
dataset (tiny model, CPU)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from camouflaged_vlm_tpu.data import (
    OVCamoIndex,
    iter_eval_batches,
    iter_train_batches,
    sam_image_transform,
    clip_image_transform,
    clip_ones_alpha,
    mask_to_target,
)
from camouflaged_vlm_tpu.data.transforms import ONES_ALPHA_VALUE


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ovcamo")
    rng = np.random.default_rng(0)
    classes = [
        {"name": "cat", "split": "train"},
        {"name": "owl", "split": "train"},
        {"name": "bat", "split": "test"},
        {"name": "slug", "split": "test"},
    ]
    samples = []
    for split in ("train", "test"):
        os.makedirs(root / split / "image")
        os.makedirs(root / split / "mask")
    for i, (name, split) in enumerate(
        [("cat", "train"), ("owl", "train"), ("cat", "train"),
         ("bat", "test"), ("slug", "test"), ("bat", "test")]
    ):
        uid = f"img{i}"
        h, w = 80 + 7 * i, 100 + 5 * i
        img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        mask = Image.fromarray(
            ((rng.random((h, w)) > 0.6) * 255).astype(np.uint8)
        )
        img.save(root / split / "image" / f"{uid}.jpg")
        mask.save(root / split / "mask" / f"{uid}.png")
        samples.append({"unique_id": uid, "base_class": name,
                        "image": f"{uid}.jpg", "mask": f"{uid}.png"})
    os.makedirs(root / "jsonfile")
    with open(root / "jsonfile" / "class_info.json", "w") as f:
        json.dump(classes, f)
    with open(root / "jsonfile" / "sample_info.json", "w") as f:
        json.dump(samples, f)
    info = {
        "OVCamo_CLASS_JSON_PATH": str(root / "jsonfile" / "class_info.json"),
        "OVCamo_SAMPLE_JSON_PATH": str(root / "jsonfile" / "sample_info.json"),
        "OVCamo_TR_IMAGE_DIR": str(root / "train" / "image"),
        "OVCamo_TR_MASK_DIR": str(root / "train" / "mask"),
        "OVCamo_TE_IMAGE_DIR": str(root / "test" / "image"),
        "OVCamo_TE_MASK_DIR": str(root / "test" / "mask"),
    }
    return info


def test_index_splits(synthetic_dataset):
    tr = OVCamoIndex.from_dataset_info(synthetic_dataset, "train")
    te = OVCamoIndex.from_dataset_info(synthetic_dataset, "test")
    assert tr.classes == ["cat", "owl"] and len(tr) == 3
    assert te.classes == ["bat", "slug"] and len(te) == 3
    assert all(os.path.exists(s.image_path) for s in tr.samples + te.samples)


def test_eval_batches_shapes(synthetic_dataset):
    te = OVCamoIndex.from_dataset_info(synthetic_dataset, "test")
    batches = list(iter_eval_batches(te, batch_size=2, inp_size=64, clip_size=28))
    assert [len(b) for b in batches] == [2, 1]
    s = batches[0][0]
    assert s.inp.shape == (64, 64, 3) and s.gt.shape == (64, 64, 1)
    assert s.clip_image.shape == (28, 28, 3) and s.clip_mask.shape == (28, 28, 1)
    np.testing.assert_allclose(s.clip_mask, ONES_ALPHA_VALUE)
    assert set(np.unique(s.gt)).issubset({0.0, 1.0})


def test_train_batches_shapes(synthetic_dataset):
    tr = OVCamoIndex.from_dataset_info(synthetic_dataset, "train")
    rng = np.random.default_rng(0)
    batches = list(iter_train_batches(tr, 2, rng, inp_size=64, clip_size=28))
    assert len(batches) == 1
    b = batches[0]
    assert b["inp"].shape == (2, 64, 64, 3)
    assert b["gt"].shape == (2, 64, 64, 1)
    assert b["label_id"].dtype == np.int32


def test_uint8_path_matches_fp32_transforms(rng):
    """raw_uint8 resize + in-graph normalisation == host fp32 transforms."""
    from camouflaged_vlm_tpu.data.transforms import (
        IMAGENET_MEAN, IMAGENET_STD, OPENAI_CLIP_MEAN, OPENAI_CLIP_STD,
        clip_image_resized_u8, sam_image_resized_u8,
    )

    arr = rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)
    img = Image.fromarray(arr)

    u8 = sam_image_resized_u8(img, 64)
    assert u8.dtype == np.uint8 and u8.shape == (64, 64, 3)
    got = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(got, sam_image_transform(img, 64), atol=1e-6)

    cu8 = clip_image_resized_u8(img, 28)
    assert cu8.dtype == np.uint8 and cu8.shape == (28, 28, 3)
    got = (cu8.astype(np.float32) / 255.0 - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD
    np.testing.assert_allclose(got, clip_image_transform(img, 28), atol=1e-6)


def test_transform_normalisation_analytic(rng):
    """Normalisation/crop geometry checks without torchvision."""
    arr = rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    got = sam_image_transform(img, 64)
    assert got.shape == (64, 64, 3)
    # invert the normalisation: recovered values must lie in [0, 1]
    rec = got * np.array([0.229, 0.224, 0.225]) + np.array([0.485, 0.456, 0.406])
    assert rec.min() > -1e-5 and rec.max() < 1 + 1e-5

    got_clip = clip_image_transform(img, 28)
    assert got_clip.shape == (28, 28, 3)
    # shorter side (50) -> 28, width -> round(70*28/50)=39, center crop cols [5:33]
    full = clip_image_transform(img, 28)
    assert np.isfinite(full).all()

    alpha = clip_ones_alpha(28)
    np.testing.assert_allclose(alpha, (1.0 - 0.5) / 0.26)


def test_transform_parity_with_torchvision(rng):
    """PIL-based transforms vs torchvision oracles (skipped if unavailable)."""
    pytest.importorskip("torchvision")
    import torch
    from torchvision import transforms as T
    from torchvision.transforms import InterpolationMode

    arr = rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)
    img = Image.fromarray(arr)

    got = sam_image_transform(img, 64)
    oracle = T.Compose([
        T.Resize((64, 64)), T.ToTensor(),
        T.Normalize([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    ])(img).numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(got, oracle, atol=1e-5)

    got_clip = clip_image_transform(img, 28)
    oracle_clip = T.Compose([
        T.Resize(28, interpolation=InterpolationMode.BICUBIC),
        T.CenterCrop(28), T.ToTensor(),
        T.Normalize((0.48145466, 0.4578275, 0.40821073),
                    (0.26862954, 0.26130258, 0.27577711)),
    ])(img).numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(got_clip, oracle_clip, atol=1e-5)

    mask = Image.fromarray(((rng.random((50, 70)) > 0.5) * 255).astype(np.uint8))
    got_mask = mask_to_target(mask, 64)
    oracle_mask = T.Compose([
        T.Resize((64, 64), interpolation=InterpolationMode.NEAREST), T.ToTensor()
    ])(mask).numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(got_mask, oracle_mask, atol=1e-6)


@pytest.mark.slow  # ~60s; eval e2e also covered by the eval CLI smoke + test_eval_ab
def test_end_to_end_eval_on_synthetic(synthetic_dataset):
    """Full evaluate() loop with the tiny cascade on the synthetic test split."""
    from camouflaged_vlm_tpu.cli.common import assemble_cascade
    from camouflaged_vlm_tpu.cli.evaluate import evaluate

    te = OVCamoIndex.from_dataset_info(synthetic_dataset, "test")
    model, cfg, params, bank = assemble_cascade(
        te.classes, tiny=True, dtype=jnp.float32
    )
    results = evaluate(model, cfg, params, bank, te, batch_size=2, num_workers=2)
    for key in ("sm", "wfm", "mae", "adpfm", "maxem", "avgiou",
                "ori_sm", "ori_em", "ori_wfm", "ori_mae",
                "accuracy", "top5", "macro_f1"):
        assert key in results, key
    assert results["images"] == 3
    assert 0 <= results["mae"] <= 1 and 0 <= results["sm"] <= 1


@pytest.mark.slow  # ~2 min; nightly tier (the flag is a thin pre_cls=gt_cls bypass)
def test_oracle_cls_eval(synthetic_dataset):
    """pre_cls=gt_cls bypass (reference debug entry): class-aware scores are
    never hurt by removing classification mistakes."""
    from camouflaged_vlm_tpu.cli.common import assemble_cascade
    from camouflaged_vlm_tpu.cli.evaluate import evaluate

    te = OVCamoIndex.from_dataset_info(synthetic_dataset, "test")
    model, cfg, params, bank = assemble_cascade(
        te.classes, tiny=True, dtype=jnp.float32
    )
    plain = evaluate(model, cfg, params, bank, te, batch_size=2, num_workers=2)
    oracle = evaluate(
        model, cfg, params, bank, te, batch_size=2, num_workers=2, oracle_cls=True
    )
    # with random weights some predictions are wrong -> zeroed scores; the
    # oracle bypass can only raise (or equal) the class-aware aggregates
    for key in ("avgiou", "avgfm", "sm", "wfm"):
        assert oracle[key] >= plain[key] - 1e-9, (key, oracle[key], plain[key])
    # MAE is maxed to 1 on mismatch, so oracle MAE can only be <= plain
    assert oracle["mae"] <= plain["mae"] + 1e-9
    # class-agnostic COD metrics are untouched by the bypass
    assert oracle["ori_mae"] == plain["ori_mae"]


@pytest.mark.slow  # ~2 min equality; fast tier covers dp via the serve-engine dp test
@pytest.mark.parametrize("n_model", [1, 4])
def test_data_parallel_eval_matches_single_device(synthetic_dataset, n_model):
    """evaluate() on a sharded mesh == single-device results.

    n_model=1: pure data parallelism (8-way batch sharding).
    n_model=4: dp=2 x tp=4 — params sharded by the Megatron rules
    (qkv/MLP-up column-, proj/MLP-down row-parallel), GSPMD inserting the
    per-block all-reduces. Numerics tolerance is looser for tp: the
    collectives reassociate the contraction reductions."""
    from camouflaged_vlm_tpu.cli.common import assemble_cascade
    from camouflaged_vlm_tpu.cli.evaluate import evaluate
    from camouflaged_vlm_tpu.parallel import make_mesh

    te = OVCamoIndex.from_dataset_info(synthetic_dataset, "test")
    model, cfg, params, bank = assemble_cascade(
        te.classes, tiny=True, dtype=jnp.float32
    )
    single = evaluate(model, cfg, params, bank, te, batch_size=8, num_workers=2)
    mesh = make_mesh(n_model=n_model)  # 8 virtual CPU devices (conftest)
    sharded = evaluate(
        model, cfg, params, bank, te, batch_size=8, num_workers=2, mesh=mesh
    )
    tol = 1e-6 if n_model == 1 else 5e-4
    for key in ("sm", "wfm", "mae", "avgiou", "ori_mae", "accuracy"):
        assert abs(single[key] - sharded[key]) < tol, (key, single[key], sharded[key])


def test_map_bounded_backpressure_and_order():
    """_map_bounded must (a) preserve submission order and (b) never start
    more loads than consumed + window, so a slow consumer cannot accumulate
    the whole decoded dataset in RAM (loader.py's eval/train prefetch)."""
    import threading
    import time

    from camouflaged_vlm_tpu.data.loader import _map_bounded

    started = []
    lock = threading.Lock()

    def load(i):
        with lock:
            started.append(i)
        return i * i

    n, window = 64, 6
    out = []
    for consumed, val in enumerate(_map_bounded(load, list(range(n)), 2, window)):
        # give workers every chance to over-run the window if they could
        time.sleep(0.002)
        with lock:
            assert len(started) <= consumed + 1 + window, (
                f"{len(started)} loads started after consuming {consumed + 1} "
                f"with window {window}"
            )
        out.append(val)
    assert out == [i * i for i in range(n)]


def test_clip_geometry_matches_torchvision_formulas():
    """Resize/center-crop geometry against torchvision's SOURCE formulas
    (new_long = int(size*long/short); offset = int(round(diff/2.0)) with
    Python banker's rounding) — the reference preprocessing is torchvision
    Resize+CenterCrop (alpha_clip_rw/alpha_clip.py:79-85). Pure-PIL oracle
    so this cannot silently skip like the torchvision-import parity test
    (torchvision is absent in this image)."""
    from PIL import Image as _Image

    from camouflaged_vlm_tpu.data.transforms import (
        _center_crop,
        _resize_shorter_side,
    )

    n = 336
    for (w, h) in [(400, 503), (50, 70), (70, 50), (337, 500),
                   (1000, 341), (336, 336), (200, 603), (347, 336)]:
        out = _resize_shorter_side(_Image.new("RGB", (w, h)), n, _Image.BICUBIC)
        ow, oh = out.size
        if w <= h:
            assert (ow, oh) == (n, max(1, int(h * n / w))), (w, h, ow, oh)
        else:
            assert (ow, oh) == (max(1, int(w * n / h)), n), (w, h, ow, oh)

    # crop offsets, including the diff % 4 == 3 banker's-rounding cases
    # (diff 11 -> offset 6, diff 13 -> offset 6, diff 9 -> offset 4)
    for H in (n + 9, n + 11, n + 13, n + 1, n + 2, n):
        arr = np.broadcast_to(
            np.arange(H, dtype=np.float32)[:, None, None], (H, n, 1)
        )
        got = _center_crop(arr, n)
        assert got.shape[0] == n
        assert got[0, 0, 0] == int(round((H - n) / 2.0)), (H, got[0, 0, 0])
