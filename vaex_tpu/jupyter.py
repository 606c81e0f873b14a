"""Jupyter interactive widgets (reference: packages/vaex-jupyter, 3471 LoC).

The reference's reactive model — Axis state machines + DataArray models
recomputing grids through delayed aggregations — is compressed here into a
``df.widget`` accessor producing ipywidgets dashboards over the same binby
grids: histogram and heatmap with expression/shape/limits controls and a
selection expression box; every interaction re-runs one fused device pass.
Degrades gracefully when ipywidgets/matplotlib are unavailable.
"""

from __future__ import annotations

import numpy as np

from .dataframe import register_dataframe_accessor


@register_dataframe_accessor("widget")
class DataFrameAccessorWidget:
    def __init__(self, df):
        self.df = df

    def _numeric_columns(self):
        from .datatype import DataType
        return [c for c in self.df.get_column_names()
                if DataType(self.df.data_type(c)).numpy.kind in "biuf"]

    def histogram(self, x=None, shape=64, selection_box=True):
        import ipywidgets as widgets
        import matplotlib
        import matplotlib.pyplot as plt
        from IPython.display import clear_output

        df = self.df
        columns = self._numeric_columns()
        x = x or columns[0]
        dd_x = widgets.Dropdown(options=columns, value=str(x), description="x")
        sl_shape = widgets.IntSlider(value=shape, min=8, max=512, description="bins")
        txt_sel = widgets.Text(value="", description="selection")
        out = widgets.Output()

        def update(*_):
            with out:
                clear_output(wait=True)
                sel = txt_sel.value.strip() or False
                limits = df.limits(dd_x.value, None, selection=sel)
                counts = df.count(binby=[dd_x.value], limits=[limits],
                                  shape=sl_shape.value, selection=sel)
                centers = np.linspace(limits[0], limits[1], sl_shape.value + 1)[:-1]
                plt.figure(figsize=(7, 3))
                plt.plot(centers, counts, drawstyle="steps-mid")
                plt.xlabel(dd_x.value)
                plt.ylabel("count")
                plt.show()

        for w in (dd_x, sl_shape, txt_sel):
            w.observe(update, "value")
        update()
        controls = [dd_x, sl_shape] + ([txt_sel] if selection_box else [])
        return widgets.VBox([widgets.HBox(controls), out])

    def heatmap(self, x=None, y=None, shape=128):
        import ipywidgets as widgets
        import matplotlib.pyplot as plt
        from IPython.display import clear_output

        df = self.df
        columns = self._numeric_columns()
        x = x or columns[0]
        y = y or (columns[1] if len(columns) > 1 else columns[0])
        dd_x = widgets.Dropdown(options=columns, value=str(x), description="x")
        dd_y = widgets.Dropdown(options=columns, value=str(y), description="y")
        txt_sel = widgets.Text(value="", description="selection")
        out = widgets.Output()

        def update(*_):
            with out:
                clear_output(wait=True)
                sel = txt_sel.value.strip() or False
                limits = df.limits([dd_x.value, dd_y.value], None, selection=sel)
                grid = df.count(binby=[dd_x.value, dd_y.value], limits=limits,
                                shape=shape, selection=sel)
                values = np.log1p(np.asarray(grid, dtype="f8"))
                plt.figure(figsize=(6, 5))
                plt.imshow(values.T, origin="lower", aspect="auto",
                           extent=[limits[0][0], limits[0][1], limits[1][0], limits[1][1]])
                plt.xlabel(dd_x.value)
                plt.ylabel(dd_y.value)
                plt.show()

        for w in (dd_x, dd_y, txt_sel):
            w.observe(update, "value")
        update()
        return widgets.VBox([widgets.HBox([dd_x, dd_y, txt_sel]), out])
