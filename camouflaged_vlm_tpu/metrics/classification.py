"""Open-vocabulary classification evaluator.

Equivalent of `/root/reference/recorder/new_evaluator.py:22-119`:
top-1 / top-5 accuracy and macro-F1 over class logits.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


class ClassificationEvaluator:
    def __init__(self, class_names: Optional[Sequence[str]] = None):
        self.class_names = list(class_names) if class_names else None
        self.reset()

    def reset(self):
        self._correct = 0
        self._correct5 = 0
        self._total = 0
        self._y_true = []
        self._y_pred = []

    def process(self, logits: np.ndarray, labels: np.ndarray) -> None:
        """logits: (B, C) scores; labels: (B,) int."""
        logits = np.asarray(logits)
        labels = np.asarray(labels).reshape(-1)
        pred = logits.argmax(axis=1)
        k = min(5, logits.shape[1])
        top5 = np.argpartition(-logits, k - 1, axis=1)[:, :k]
        self._correct += int((pred == labels).sum())
        self._correct5 += int(sum(labels[i] in top5[i] for i in range(len(labels))))
        self._total += len(labels)
        self._y_true.extend(labels.tolist())
        self._y_pred.extend(pred.tolist())

    def evaluate(self) -> Dict[str, float]:
        from sklearn.metrics import f1_score

        acc = 100.0 * self._correct / self._total
        top5 = 100.0 * self._correct5 / self._total
        macro_f1 = 100.0 * f1_score(
            self._y_true,
            self._y_pred,
            average="macro",
            labels=np.unique(self._y_true),
        )
        return {
            "accuracy": acc,
            "error_rate": 100.0 - acc,
            "top5": top5,
            "macro_f1": macro_f1,
        }
