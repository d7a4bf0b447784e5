from .sod import (
    prepare_pred_gt,
    mae_score,
    s_measure,
    weighted_f_measure,
    threshold_curves,
    adaptive_threshold,
    SodStats,
)
from .cod import CODMetrics, calc_cod_batch
from .ovcos import OVCOSMetricer, calc_ovcamo
from .classification import ClassificationEvaluator
