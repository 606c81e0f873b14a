"""Model evaluation metrics computed with engine aggregations
(reference: vaex-ml/vaex/ml/metrics.py:13-328, DataFrameAccessorMetrics).

Every metric reduces through the DataFrame's own fused aggregation passes
(counts/sums over virtual expressions) — nothing materializes the
prediction columns on the host, so metrics run out-of-core like every
other aggregation.
"""

from __future__ import annotations

import numpy as np


def _names(*args):
    return [str(a) for a in args]


class DataFrameAccessorMetrics:
    """``df.ml.metrics`` (reference metrics.py:13)."""

    def __init__(self, df):
        self.df = df

    # -- classification ------------------------------------------------------
    def accuracy_score(self, y_true, y_pred, selection=None):
        """Fraction of exact matches (reference metrics.py:26)."""
        y_true, y_pred = _names(y_true, y_pred)
        df = self.df
        return float(df.mean(f"where(({y_true}) == ({y_pred}), 1.0, 0.0)",
                             selection=selection))

    def confusion_matrix(self, y_true, y_pred, array_type=None, selection=None):
        """[n_classes, n_classes] counts, classes sorted ascending
        (reference metrics.py:46)."""
        y_true, y_pred = _names(y_true, y_pred)
        df = self.df
        if selection is not None:
            df = df.filter(str(selection))
        classes = sorted(set(df.unique(y_true)) | set(df.unique(y_pred)))
        lut = {c: i for i, c in enumerate(classes)}
        n = len(classes)
        out = (df.groupby([y_true, y_pred],
                          agg={"__n": "count"}, sort=True))
        C = np.zeros((n, n), np.int64)
        t = np.asarray(out[y_true].tolist())
        p = np.asarray(out[y_pred].tolist())
        c = np.asarray(out["__n"].tolist())
        for ti, pi, ci in zip(t, p, c):
            C[lut[ti], lut[pi]] = ci
        return C

    def precision_recall_fscore(self, y_true, y_pred, average="binary",
                                selection=None):
        """(precision, recall, f1) — 'binary' counts class 1 as positive,
        'macro' averages the per-class scores (reference metrics.py:74)."""
        y_true, y_pred = _names(y_true, y_pred)
        df = self.df
        if average == "binary":
            tp = float(df.sum(f"where((({y_true}) == 1) & (({y_pred}) == 1), 1, 0)",
                              selection=selection))
            pred_pos = float(df.sum(f"where(({y_pred}) == 1, 1, 0)",
                                    selection=selection))
            true_pos = float(df.sum(f"where(({y_true}) == 1, 1, 0)",
                                    selection=selection))
            precision = tp / pred_pos if pred_pos else 0.0
            recall = tp / true_pos if true_pos else 0.0
            f1 = (2 * precision * recall / (precision + recall)
                  if (precision + recall) else 0.0)
            return precision, recall, f1
        C = self.confusion_matrix(y_true, y_pred, selection=selection).astype("f8")
        with np.errstate(divide="ignore", invalid="ignore"):
            precision_array = np.diag(C) / np.sum(C, axis=0)
            recall_array = np.diag(C) / np.sum(C, axis=1)
            f1_array = 2 * (precision_array * recall_array) / (precision_array + recall_array)
        return (float(np.nanmean(precision_array)),
                float(np.nanmean(recall_array)),
                float(np.nanmean(f1_array)))

    def precision_score(self, y_true, y_pred, average="binary", selection=None):
        return self.precision_recall_fscore(y_true, y_pred, average, selection)[0]

    def recall_score(self, y_true, y_pred, average="binary", selection=None):
        return self.precision_recall_fscore(y_true, y_pred, average, selection)[1]

    def f1_score(self, y_true, y_pred, average="binary", selection=None):
        return self.precision_recall_fscore(y_true, y_pred, average, selection)[2]

    def matthews_correlation_coefficient(self, y_true, y_pred, selection=None):
        """MCC from the confusion matrix (reference metrics.py:202; the
        multi-class generalization, sklearn-compatible)."""
        C = self.confusion_matrix(y_true, y_pred, selection=selection).astype("f8")
        t_sum = C.sum(axis=1)
        p_sum = C.sum(axis=0)
        n = C.sum()
        correct = np.trace(C)
        cov_ytyp = correct * n - np.dot(t_sum, p_sum)
        cov_ypyp = n * n - np.dot(p_sum, p_sum)
        cov_ytyt = n * n - np.dot(t_sum, t_sum)
        denom = np.sqrt(cov_ytyt * cov_ypyp)
        return float(cov_ytyp / denom) if denom else 0.0

    def classification_report(self, y_true, y_pred, average="binary", decimals=3):
        """Text report: accuracy/precision/recall/f1 (reference
        metrics.py:235)."""
        acc = self.accuracy_score(y_true, y_pred)
        p, r, f = self.precision_recall_fscore(y_true, y_pred, average=average)
        fmt = f"%.{decimals}f"
        return ("\n        Classification report:\n\n"
                f"        Accuracy:  {fmt % acc}\n"
                f"        Precision: {fmt % p}\n"
                f"        Recall:    {fmt % r}\n"
                f"        F1:        {fmt % f}\n        ")

    # -- regression ----------------------------------------------------------
    def mean_absolute_error(self, y_true, y_pred, selection=None):
        y_true, y_pred = _names(y_true, y_pred)
        return float(self.df.mean(f"abs(({y_true}) - ({y_pred}))",
                                  selection=selection))

    def mean_squared_error(self, y_true, y_pred, selection=None):
        y_true, y_pred = _names(y_true, y_pred)
        return float(self.df.mean(f"(({y_true}) - ({y_pred}))**2",
                                  selection=selection))

    def r2_score(self, y_true, y_pred, selection=None):
        """1 - SS_res / SS_tot (reference metrics.py:306)."""
        y_true, y_pred = _names(y_true, y_pred)
        df = self.df
        ss_res = float(df.sum(f"(({y_true}) - ({y_pred}))**2", selection=selection))
        mean_true = float(df.mean(y_true, selection=selection))
        ss_tot = float(df.sum(f"(({y_true}) - {mean_true!r})**2",
                              selection=selection))
        return 1.0 - ss_res / ss_tot if ss_tot else 0.0
