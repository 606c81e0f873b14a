"""Transformers: fit = engine aggregation passes, transform = virtual columns.

Re-design of the reference's ``vaex-ml/transformations.py``.  Each class keeps
its fitted statistics as plain python/numpy state (``state_get/state_set``)
and ``transform`` returns a shallow df copy with added virtual columns.
Reference line anchors: PCA :56, LabelEncoder :314, OneHot :378,
MultiHot :484, FrequencyEncoder :537, StandardScaler :594, MinMax :660,
MaxAbs :750, Robust :800, CycleTransformer :871, BayesianTargetEncoder :927,
WeightOfEvidence :999, KBinsDiscretizer :1078, GroupByTransformer :1204.
"""

from __future__ import annotations

import numpy as np


class Transformer:
    snake_name = "transformer"

    def __init__(self, features=None, prefix="", **kwargs):
        self.features = list(features) if features else []
        self.prefix = prefix
        for k, v in kwargs.items():
            setattr(self, k, v)

    def fit(self, df):
        raise NotImplementedError

    def transform(self, df):
        raise NotImplementedError

    def fit_transform(self, df):
        self.fit(df)
        return self.transform(df)

    # -- state ---------------------------------------------------------------
    def state_get(self):
        state = {"class": type(self).__name__}
        for k, v in self.__dict__.items():
            state[k] = v.tolist() if isinstance(v, np.ndarray) else v
        return state

    def state_set(self, state):
        for k, v in state.items():
            if k != "class":
                setattr(self, k, np.asarray(v) if isinstance(v, list) and k.endswith("_") else v)
        return self


class StandardScaler(Transformer):
    """(x - mean) / std (reference transformations.py:594)."""

    snake_name = "standard_scaler"

    def __init__(self, features=None, with_mean=True, with_std=True, prefix="standard_scaled_"):
        super().__init__(features, prefix)
        self.with_mean = with_mean
        self.with_std = with_std
        self.mean_ = None
        self.std_ = None

    def fit(self, df):
        means = [df.mean(f, delay=True) for f in self.features]
        stds = [df.std(f, delay=True) for f in self.features]
        df.execute()
        self.mean_ = [float(np.asarray(m.get())) for m in means]
        self.std_ = [float(np.asarray(s.get())) for s in stds]
        return self

    def transform(self, df):
        df = df.copy()
        for f, m, s in zip(self.features, self.mean_, self.std_):
            expr = str(f)
            if self.with_mean:
                expr = f"({expr} - {m!r})"
            if self.with_std:
                expr = f"({expr} / {s!r})"
            df[self.prefix + f] = expr
        return df


class MinMaxScaler(Transformer):
    """(reference transformations.py:660)"""

    snake_name = "minmax_scaler"

    def __init__(self, features=None, feature_range=(0, 1), prefix="minmax_scaled_"):
        super().__init__(features, prefix)
        self.feature_range = tuple(feature_range)
        self.fmin_ = None
        self.fmax_ = None

    def fit(self, df):
        mms = [df.minmax(f, delay=True) for f in self.features]
        df.execute()
        values = [np.asarray(p.get()) for p in mms]
        self.fmin_ = [float(v[0]) for v in values]
        self.fmax_ = [float(v[1]) for v in values]
        return self

    def transform(self, df):
        df = df.copy()
        a, b = self.feature_range
        for f, lo, hi in zip(self.features, self.fmin_, self.fmax_):
            scale = (hi - lo) or 1.0
            df[self.prefix + f] = f"({a!r} + ({b!r} - {a!r}) * (({f}) - {lo!r}) / {scale!r})"
        return df


class MaxAbsScaler(Transformer):
    """(reference transformations.py:750)"""

    snake_name = "max_abs_scaler"

    def __init__(self, features=None, prefix="absmax_scaled_"):
        super().__init__(features, prefix)
        self.absmax_ = None

    def fit(self, df):
        mms = [df.minmax(f, delay=True) for f in self.features]
        df.execute()
        self.absmax_ = [float(np.max(np.abs(np.asarray(p.get())))) or 1.0 for p in mms]
        return self

    def transform(self, df):
        df = df.copy()
        for f, m in zip(self.features, self.absmax_):
            df[self.prefix + f] = f"(({f}) / {m!r})"
        return df


class RobustScaler(Transformer):
    """Median/IQR scaling (reference transformations.py:800)."""

    snake_name = "robust_scaler"

    def __init__(self, features=None, with_centering=True, with_scaling=True,
                 percentile_range=(25, 75), prefix="robust_scaled_"):
        super().__init__(features, prefix)
        self.with_centering = with_centering
        self.with_scaling = with_scaling
        self.percentile_range = tuple(percentile_range)
        self.center_ = None
        self.scale_ = None

    def fit(self, df):
        self.center_ = []
        self.scale_ = []
        lo_p, hi_p = self.percentile_range
        for f in self.features:
            med = df.percentile_approx(f, 50.0)
            lo = df.percentile_approx(f, lo_p)
            hi = df.percentile_approx(f, hi_p)
            self.center_.append(float(med))
            self.scale_.append(float(hi - lo) or 1.0)
        return self

    def transform(self, df):
        df = df.copy()
        for f, c, s in zip(self.features, self.center_, self.scale_):
            expr = str(f)
            if self.with_centering:
                expr = f"({expr} - {c!r})"
            if self.with_scaling:
                expr = f"({expr} / {s!r})"
            df[self.prefix + f] = expr
        return df


class LabelEncoder(Transformer):
    """value -> dense code (reference transformations.py:314)."""

    snake_name = "label_encoder"

    def __init__(self, features=None, prefix="label_encoded_", allow_unseen=False):
        super().__init__(features, prefix)
        self.allow_unseen = allow_unseen
        self.labels_ = {}

    def fit(self, df):
        for f in self.features:
            oset = df._set(f)
            keys = oset.key_array(masked=False)
            self.labels_[f] = list(keys[:oset.n_keys])
        return self

    def transform(self, df):
        df = df.copy()
        for f in self.features:
            from ..ops.setops import SortedSet
            labels = np.asarray(self.labels_[f])
            dtype = "string" if labels.dtype.kind in "OUS" else labels.dtype
            oset = SortedSet(dtype)
            oset.update(labels)
            var = df.add_variable(f"label_set_{f}", oset, unique=True)
            df[self.prefix + f] = f"_ordinal_values({f}, {var})"
        return df


class OneHotEncoder(Transformer):
    """One virtual 0/1 column per category (reference transformations.py:378)."""

    snake_name = "one_hot_encoder"

    def __init__(self, features=None, prefix="", one=1, zero=0):
        super().__init__(features, prefix)
        self.one = one
        self.zero = zero
        self.uniques_ = {}

    def fit(self, df):
        for f in self.features:
            values = df.unique(f, dropmissing=False, array_type="list")
            self.uniques_[f] = sorted([v for v in values if v is not None],
                                      key=lambda v: (isinstance(v, str), v)) + \
                ([None] if any(v is None for v in values) else [])
        return self

    def transform(self, df):
        df = df.copy()
        for f in self.features:
            for value in self.uniques_[f]:
                if value is None:
                    column_name = self.prefix + f + "_missing"
                    expr = f"where(ismissing({f}), {self.one!r}, {self.zero!r})"
                else:
                    safe = str(value).replace(" ", "_").replace("-", "_")
                    column_name = self.prefix + f + "_" + safe
                    literal = repr(value if not isinstance(value, np.generic) else value.item())
                    expr = f"where(({f} == {literal}), {self.one!r}, {self.zero!r})"
                df[column_name] = expr
        return df


class MultiHotEncoder(OneHotEncoder):
    """(reference transformations.py:484) — alias family of OneHot for round 1."""

    snake_name = "multi_hot_encoder"


class FrequencyEncoder(Transformer):
    """value -> its relative frequency (reference transformations.py:537)."""

    snake_name = "frequency_encoder"

    def __init__(self, features=None, unseen="nan", prefix="frequency_encoded_"):
        super().__init__(features, prefix)
        self.unseen = unseen
        self.mappings_ = {}

    def fit(self, df):
        n = len(df)
        for f in self.features:
            vc = df[f].value_counts(dropna=False)
            self.mappings_[f] = {k: v / n for k, v in vc.items()}
        return self

    def transform(self, df):
        df = df.copy()
        for f in self.features:
            mapping = {k: v for k, v in self.mappings_[f].items()
                       if not (isinstance(k, str) and k == "missing")}
            expr = df[f].map(mapping, default_value=np.nan)
            df[self.prefix + f] = expr
        return df


class CycleTransformer(Transformer):
    """sin/cos pair for cyclic features (reference transformations.py:871)."""

    snake_name = "cycle_transformer"

    def __init__(self, features=None, n=None, prefix_x="", prefix_y="",
                 suffix_x="_x", suffix_y="_y"):
        super().__init__(features, "")
        self.n = n
        self.prefix_x = prefix_x
        self.prefix_y = prefix_y
        self.suffix_x = suffix_x
        self.suffix_y = suffix_y

    def fit(self, df):
        return self

    def transform(self, df):
        df = df.copy()
        for f in self.features:
            df[self.prefix_x + f + self.suffix_x] = f"cos(2 * 3.141592653589793 * ({f}) / {self.n!r})"
            df[self.prefix_y + f + self.suffix_y] = f"sin(2 * 3.141592653589793 * ({f}) / {self.n!r})"
        return df


class PCA(Transformer):
    """PCA via the engine's covariance matrix (reference transformations.py:56)."""

    snake_name = "pca"

    def __init__(self, features=None, n_components=None, prefix="PCA_", whiten=False):
        super().__init__(features, prefix)
        self.n_components = n_components
        self.whiten = whiten
        self.means_ = None
        self.eigen_vectors_ = None
        self.eigen_values_ = None

    def fit(self, df):
        C = df.cov(self.features)
        means = [df.mean(f, delay=True) for f in self.features]
        df.execute()
        self.means_ = [float(np.asarray(m.get())) for m in means]
        eigen_values, eigen_vectors = np.linalg.eigh(np.asarray(C))
        order = np.argsort(eigen_values)[::-1]
        self.eigen_values_ = eigen_values[order].tolist()
        self.eigen_vectors_ = eigen_vectors[:, order].tolist()
        return self

    def transform(self, df):
        df = df.copy()
        V = np.asarray(self.eigen_vectors_)
        k = self.n_components or len(self.features)
        centered = [f"(({f}) - {m!r})" for f, m in zip(self.features, self.means_)]
        for i in range(k):
            terms = [f"({float(V[j, i])!r}) * {centered[j]}" for j in range(len(self.features))]
            df[f"{self.prefix}{i}"] = " + ".join(terms)
        return df


class KBinsDiscretizer(Transformer):
    """Bin continuous features (reference transformations.py:1078)."""

    snake_name = "kbins_discretizer"

    def __init__(self, features=None, n_bins=5, strategy="uniform", prefix="binned_"):
        super().__init__(features, prefix)
        self.n_bins = n_bins
        self.strategy = strategy
        self.bin_edges_ = {}

    def fit(self, df):
        for f in self.features:
            if self.strategy == "uniform":
                vmin, vmax = df.minmax(f)
                edges = np.linspace(vmin, vmax, self.n_bins + 1)
            elif self.strategy == "quantile":
                qs = np.linspace(0, 100, self.n_bins + 1)
                edges = np.asarray([df.percentile_approx(f, float(q)) for q in qs])
            else:
                raise ValueError(f"unknown strategy {self.strategy!r}")
            self.bin_edges_[f] = edges.tolist()
        return self

    def transform(self, df):
        df = df.copy()
        for f in self.features:
            edges = np.asarray(self.bin_edges_[f])
            inner = edges[1:-1]
            var = df.add_variable(f"kbins_edges_{f}", inner, unique=True)
            df[self.prefix + f] = f"searchsorted({f}, {var}, side='right')"
        return df


class BayesianTargetEncoder(Transformer):
    """(reference transformations.py:927)"""

    snake_name = "bayesian_target_encoder"

    def __init__(self, features=None, target=None, weight=100, prefix="mean_encoded_"):
        super().__init__(features, prefix)
        self.target = target
        self.weight = weight
        self.mappings_ = {}
        self.global_mean_ = None

    def fit(self, df):
        from .. import agg as agg_module
        self.global_mean_ = float(np.asarray(df.mean(self.target)))
        for f in self.features:
            gb = df.groupby(f, agg={"__count": "count",
                                    "__mean": agg_module.mean(self.target)}, sort=True)
            keys = gb[f].tolist()
            counts = np.asarray(gb["__count"].tolist(), dtype=np.float64)
            means = np.asarray(gb["__mean"].tolist(), dtype=np.float64)
            blended = (counts * means + self.weight * self.global_mean_) / (counts + self.weight)
            self.mappings_[f] = dict(zip(keys, blended.tolist()))
        return self

    def transform(self, df):
        df = df.copy()
        for f in self.features:
            mapping = {k: v for k, v in self.mappings_[f].items() if k is not None}
            df[self.prefix + f] = df[f].map(mapping, default_value=self.global_mean_)
        return df


class WeightOfEvidenceEncoder(Transformer):
    """(reference transformations.py:999)"""

    snake_name = "woe_encoder"

    def __init__(self, features=None, target=None, unseen="nan", epsilon=1e-9,
                 prefix="woe_encoded_"):
        super().__init__(features, prefix)
        self.target = target
        self.epsilon = epsilon
        self.mappings_ = {}

    def fit(self, df):
        from .. import agg as agg_module
        for f in self.features:
            gb = df.groupby(f, agg={"__pos": agg_module.sum(self.target), "__n": "count"}, sort=True)
            keys = gb[f].tolist()
            pos = np.asarray(gb["__pos"].tolist(), dtype=np.float64)
            n = np.asarray(gb["__n"].tolist(), dtype=np.float64)
            neg = n - pos
            p = np.clip(pos / np.maximum(pos.sum(), 1), self.epsilon, None)
            q = np.clip(neg / np.maximum(neg.sum(), 1), self.epsilon, None)
            woe = np.log(p / q)
            self.mappings_[f] = dict(zip(keys, woe.tolist()))
        return self

    def transform(self, df):
        df = df.copy()
        for f in self.features:
            mapping = {k: v for k, v in self.mappings_[f].items() if k is not None}
            df[self.prefix + f] = df[f].map(mapping, default_value=np.nan)
        return df


class GroupByTransformer(Transformer):
    """Join fitted group aggregations back onto the frame
    (reference transformations.py:1204)."""

    snake_name = "groupby_transformer"

    def __init__(self, by=None, agg=None, rsuffix="_agg", df_group=None):
        super().__init__([], "")
        self.by = by
        self.agg = agg
        self.rsuffix = rsuffix
        self.df_group = df_group

    def fit(self, df):
        self.df_group = df.groupby(self.by, agg=self.agg, sort=True)
        return self

    def transform(self, df):
        return df.join(self.df_group, on=str(self.by), rsuffix=self.rsuffix,
                       allow_duplication=False)
