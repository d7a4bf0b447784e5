"""Metric parity tests against the reference's self-contained sod_metric.py
(loaded as a test-time oracle from /root/reference — never imported by the
framework itself) plus structural/behavioural checks."""

import importlib.util
import os

import numpy as np
import pytest

from camouflaged_vlm_tpu.metrics import (
    CODMetrics,
    OVCOSMetricer,
    ClassificationEvaluator,
    prepare_pred_gt,
    s_measure,
    weighted_f_measure,
    threshold_curves,
    mae_score,
)

REF_SOD = "/root/reference/recorder/sod_metric.py"


@pytest.fixture(scope="module")
def ref_sod():
    if not os.path.exists(REF_SOD):
        pytest.skip("reference oracle not available")
    spec = importlib.util.spec_from_file_location("ref_sod_metric", REF_SOD)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _random_maps(rng, h=64, w=64, fg_frac=0.3):
    gt = (rng.random((h, w)) < fg_frac).astype(np.uint8) * 255
    pred = (rng.random((h, w)) * 255).astype(np.float64)
    # make pred correlated with gt so scores are non-degenerate
    pred = 0.6 * pred + 0.4 * gt
    return pred, gt.astype(np.float64)


@pytest.mark.parametrize("fg_frac", [0.0, 0.05, 0.3, 0.9])
def test_smeasure_matches_reference(ref_sod, fg_frac):
    rng = np.random.default_rng(42)
    pred_raw, gt_raw = _random_maps(rng, fg_frac=fg_frac)
    ref = ref_sod.Smeasure()
    ref.step(pred_raw, gt_raw)
    want = ref.get_results()["sm"]
    pred, gt = prepare_pred_gt(pred_raw, gt_raw)
    got = s_measure(pred, gt)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_wfm_matches_reference(ref_sod):
    rng = np.random.default_rng(7)
    pred_raw, gt_raw = _random_maps(rng)
    ref = ref_sod.WeightedFmeasure()  # beta=0.3 default
    ref.step(pred_raw, gt_raw)
    want = ref.get_results()["wfm"]
    pred, gt = prepare_pred_gt(pred_raw, gt_raw)
    got = weighted_f_measure(pred, gt, beta=0.3)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_mae_matches_reference(ref_sod):
    rng = np.random.default_rng(3)
    pred_raw, gt_raw = _random_maps(rng)
    ref = ref_sod.MAE()
    ref.step(pred_raw, gt_raw)
    want = ref.get_results()["mae"]
    pred, gt = prepare_pred_gt(pred_raw, gt_raw)
    np.testing.assert_allclose(mae_score(pred, gt), want, atol=1e-12)


def test_fm_em_curves_match_reference(ref_sod):
    rng = np.random.default_rng(11)
    pred_raw, gt_raw = _random_maps(rng)

    ref_fm = ref_sod.Fmeasure(beta=0.3)
    ref_fm.step(pred_raw, gt_raw)
    want_fm = ref_fm.get_results()["fm"]

    ref_em = ref_sod.Emeasure()
    ref_em.step(pred_raw, gt_raw)
    want_em = ref_em.get_results()["em"]

    pred, gt = prepare_pred_gt(pred_raw, gt_raw)
    stats = threshold_curves(pred, gt, fm_beta=0.3)
    np.testing.assert_allclose(stats.fm_curve, want_fm["curve"], atol=1e-10)
    np.testing.assert_allclose(stats.fm_adp, want_fm["adp"], atol=1e-10)
    np.testing.assert_allclose(stats.em_curve, want_em["curve"], atol=1e-10)
    np.testing.assert_allclose(stats.em_adp, want_em["adp"], atol=1e-10)


def test_cod_metrics_accumulator(ref_sod):
    rng = np.random.default_rng(5)
    m = CODMetrics()
    ref_sm, ref_em, ref_wfm, ref_mae = (
        ref_sod.Smeasure(), ref_sod.Emeasure(), ref_sod.WeightedFmeasure(), ref_sod.MAE()
    )
    for _ in range(3):
        pred_raw, gt_raw = _random_maps(rng)
        m.step(pred_raw / 255.0, gt_raw / 255.0)
        ref_sm.step(pred_raw, gt_raw)
        ref_em.step(pred_raw, gt_raw)
        ref_wfm.step(pred_raw, gt_raw)
        ref_mae.step(pred_raw, gt_raw)
    sm, em, wfm, mae = m.results()
    np.testing.assert_allclose(sm, ref_sm.get_results()["sm"], atol=1e-10)
    np.testing.assert_allclose(em, ref_em.get_results()["em"]["curve"].mean(), atol=1e-10)
    np.testing.assert_allclose(wfm, ref_wfm.get_results()["wfm"], atol=1e-10)
    np.testing.assert_allclose(mae, ref_mae.get_results()["mae"], atol=1e-10)


def test_ovcos_class_mismatch_zeroing():
    rng = np.random.default_rng(9)
    gt = ((rng.random((32, 32)) < 0.4) * 255).astype(np.uint8)
    pred = gt.copy()  # perfect prediction

    right = OVCOSMetricer(class_names=["cat"], num_workers=0)
    right.step(pred, gt, "cat", "cat")
    r = right.show(num_bits=None)
    assert r["sm"] > 0.9 and r["mae"] < 0.01 and r["avgiou"] > 0.5

    wrong = OVCOSMetricer(class_names=["cat"], num_workers=0)
    wrong.step(pred, gt, "dog", "cat")
    w = wrong.show(num_bits=None)
    assert w["sm"] == 0.0 and w["mae"] == 1.0 and w["avgiou"] == 0.0 and w["avgfm"] == 0.0


def test_ovcos_iou_curves_sane():
    rng = np.random.default_rng(13)
    gt = ((rng.random((32, 32)) < 0.4) * 255).astype(np.uint8)
    pred, gtb = prepare_pred_gt(gt.astype(np.float64), gt.astype(np.float64))
    stats = threshold_curves(pred, gtb)
    # perfect prediction: IoU = 1 at every threshold that keeps fg (pred is 0/1)
    assert stats.iou_adp == 1.0
    assert stats.iou_curve.max() == 1.0


def test_classification_evaluator():
    ev = ClassificationEvaluator()
    logits = np.array(
        [[0.9, 0.05, 0.05, 0, 0, 0], [0.1, 0.8, 0.1, 0, 0, 0], [0.5, 0.3, 0.2, 0, 0, 0]]
    )
    labels = np.array([0, 1, 2])
    ev.process(logits, labels)
    res = ev.evaluate()
    assert abs(res["accuracy"] - 100 * 2 / 3) < 1e-9
    assert res["top5"] == 100.0
    assert 0 < res["macro_f1"] <= 100.0


# ---- eval host-path resize (cv2.INTER_LINEAR semantics, oracle-checked) ----

@pytest.mark.parametrize(
    "shape,out", [((64, 64), (100, 80)), ((64, 64), (37, 53)),
                  ((100, 130), (64, 64)), ((1024, 1024), (333, 457)),
                  ((5, 7), (5, 7))]
)
def test_bilinear_resize_matches_cv2(shape, out):
    """utils.image.bilinear_resize_f32 vs cv2.resize(INTER_LINEAR) — the
    reference eval's pred->original-size resample
    (`test_ovcos_maskdecoder_edge.py:36-42`). Covers up- and down-scale
    (cv2 does NOT antialias on downscale, unlike PIL)."""
    cv2 = pytest.importorskip("cv2")
    from camouflaged_vlm_tpu.utils.image import bilinear_resize_f32

    rng = np.random.default_rng(0)
    a = rng.random(shape, dtype=np.float32)
    want = cv2.resize(a, dsize=(out[1], out[0]), interpolation=cv2.INTER_LINEAR)
    got = bilinear_resize_f32(a, *out)
    np.testing.assert_allclose(got, want, atol=2e-7)
    # and through the reference's truncate-quantise: at most isolated
    # 1-ulp boundary flips
    wu = (want * 255).astype(np.uint8).astype(np.int16)
    gu = (got * 255).astype(np.uint8).astype(np.int16)
    assert np.abs(wu - gu).max() <= 1
    assert (wu != gu).mean() < 1e-4
