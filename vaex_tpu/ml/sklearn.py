"""scikit-learn predictor wrappers (reference: vaex-ml/sklearn.py).

``Predictor`` fits any sklearn estimator on evaluated feature arrays and
attaches predictions as a virtual column backed by a registered DataFrame
function — so a fitted model is part of the DataFrame state like every other
transformer.  ``IncrementalPredictor`` feeds ``partial_fit`` chunk by chunk
(out-of-core training, reference vaex-ml incremental learners).
"""

from __future__ import annotations

import numpy as np

from .transformations import Transformer


class Predictor(Transformer):
    snake_name = "sklearn_predictor"

    def __init__(self, model=None, features=None, target=None,
                 prediction_name="prediction"):
        super().__init__(features, "")
        self.model = model
        self.target = target
        self.prediction_name = prediction_name

    def _X(self, df):
        cols = [np.asarray(df.evaluate(f, array_type="numpy"), dtype="f8")
                for f in self.features]
        return np.stack(cols, axis=1)

    def fit(self, df, **kwargs):
        X = self._X(df)
        y = np.asarray(df.evaluate(str(self.target), array_type="numpy"))
        self.model.fit(X, y, **kwargs)
        return self

    def predict(self, df):
        return self.model.predict(self._X(df))

    def transform(self, df):
        df = df.copy()
        model = self.model

        def _predict(*cols):
            X = np.stack([np.asarray(c, dtype="f8") for c in cols], axis=1)
            return np.asarray(model.predict(X))

        name = df.add_function("sklearn_predict", _predict, vectorize=True, unique=True)
        df[self.prediction_name] = f"{name}({', '.join(map(str, self.features))})"
        return df


class IncrementalPredictor(Predictor):
    """Chunked partial_fit training (reference vaex-ml incremental)."""

    snake_name = "sklearn_incremental_predictor"

    def __init__(self, model=None, features=None, target=None,
                 prediction_name="prediction", batch_size=1_000_000, num_epochs=1,
                 shuffle=False, partial_fit_kwargs=None):
        super().__init__(model, features, target, prediction_name)
        self.batch_size = batch_size
        self.num_epochs = num_epochs
        self.shuffle = shuffle
        self.partial_fit_kwargs = partial_fit_kwargs or {}

    def fit(self, df, progress=None):
        for epoch in range(self.num_epochs):
            d = df.shuffle() if self.shuffle else df
            for i1, i2, _ in d.evaluate_iterator(self.features[0],
                                                 chunk_size=self.batch_size):
                sub = d[i1:i2]
                X = self._X(sub)
                y = np.asarray(sub.evaluate(str(self.target), array_type="numpy"))
                self.model.partial_fit(X, y, **self.partial_fit_kwargs)
        return self
