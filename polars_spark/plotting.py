"""Altair plot namespaces (reference py-polars/src/polars/dataframe/
plotting.py and series/plotting.py).

Like the reference, no plotting logic lives here — ``df.plot.bar(**kw)``
is shorthand for ``alt.Chart(data).mark_bar(tooltip=True).encode(**kw)
.interactive()``.  The data side is the collected pandas frame (driver
memory: plotting is an inherently driver-side, human-scale operation —
aggregate/sample FIRST on the cluster, then plot the small result).

altair isn't in this image; the namespaces import it lazily and raise
the documented env-gated error on access when absent.
"""

from __future__ import annotations

import inspect


def _altair():
    try:
        import altair as alt
    except ImportError as exc:  # pragma: no cover - env
        raise NotImplementedError("plot needs the 'altair' package") from exc
    return alt


def _encodings(x=None, y=None, color=None, order=None):
    enc = {}
    if x is not None:
        enc["x"] = x
    if y is not None:
        enc["y"] = y
    if color is not None:
        enc["color"] = color
    if order is not None:
        enc["order"] = order
    return enc


class DataFramePlot:
    """DataFrame.plot namespace (reference dataframe/plotting.py:32)."""

    def __init__(self, pdf) -> None:
        self._chart = _altair().Chart(pdf)

    def _mk(self, mark, enc, kwargs):
        marked = getattr(self._chart, "mark_" + mark)(tooltip=True)
        return marked.encode(**enc, **kwargs).interactive()

    def bar(self, x=None, y=None, color=None, /, **kwargs):
        """``alt.Chart(df).mark_bar(tooltip=True).encode(...).interactive()``
        (reference dataframe/plotting.py bar)."""
        return self._mk("bar", _encodings(x, y, color), kwargs)

    def line(self, x=None, y=None, color=None, order=None, /, **kwargs):
        """``mark_line`` shorthand (reference dataframe/plotting.py line)."""
        return self._mk("line", _encodings(x, y, color, order), kwargs)

    def point(self, x=None, y=None, color=None, /, **kwargs):
        """``mark_point`` shorthand (reference dataframe/plotting.py point)."""
        return self._mk("point", _encodings(x, y, color), kwargs)

    # reference aliases scatter -> point
    scatter = point

    def __getattr__(self, attr: str):
        # any other altair mark: df.plot.area(...) -> mark_area
        # (reference dataframe/plotting.py:237)
        method = getattr(self._chart, "mark_" + attr, None)
        if method is None:
            raise AttributeError(f"altair defines no mark_{attr} to back plot.{attr}")
        takes_tooltip = "tooltip" in inspect.signature(method).parameters

        def func(**kwargs):
            m = method(tooltip=True) if takes_tooltip else method()
            return m.encode(**kwargs).interactive()

        return func


class SeriesPlot:
    """Series.plot namespace (reference series/plotting.py:24)."""

    def __init__(self, name: str, pdf) -> None:
        self._series_name = name
        self._chart = _altair().Chart(pdf)

    def hist(self, /, **kwargs):
        """Binned bar of value counts (reference series/plotting.py hist)."""
        alt = _altair()
        if self._series_name == "count()":
            raise ValueError("plot.hist needs a Series not named 'count()' (encoding clash)")
        enc = {"x": alt.X(f"{self._series_name}:Q", bin=True), "y": "count()"}
        return self._chart.mark_bar(tooltip=True).encode(**enc, **kwargs).interactive()

    def kde(self, /, **kwargs):
        """Kernel density estimate (reference series/plotting.py kde)."""
        if self._series_name == "density":
            raise ValueError("plot.kde needs a Series not named 'density' (encoding clash)")
        enc = {"x": self._series_name, "y": "density:Q"}
        return (
            self._chart.transform_density(
                self._series_name, as_=[self._series_name, "density"]
            )
            .mark_area(tooltip=True)
            .encode(**enc, **kwargs)
            .interactive()
        )

    def line(self, /, **kwargs):
        """Value-vs-index line (reference series/plotting.py line)."""
        if self._series_name == "index":
            raise ValueError("plot.line needs a Series not named 'index' (encoding clash)")
        enc = {"x": "index", "y": self._series_name}
        return (
            self._chart.mark_line(tooltip=True).encode(**enc, **kwargs).interactive()
        )

    def __getattr__(self, attr: str):
        if attr == "index":
            raise AttributeError
        method = getattr(self._chart, "mark_" + attr, None)
        if method is None:
            raise AttributeError(f"altair defines no mark_{attr} to back plot.{attr}")

        def func(**kwargs):
            return method(tooltip=True).encode(x="index", y=self._series_name, **kwargs).interactive()

        return func


def _display_dot(dot: str, figsize=(16.0, 12.0)):
    """Render graphviz dot via matplotlib (reference _utils/various.py
    display_dot_graph) — only reachable when both packages are installed."""
    import io

    import graphviz
    import matplotlib.image as mpimg
    import matplotlib.pyplot as plt

    png = graphviz.Source(dot).pipe(format="png")
    img = mpimg.imread(io.BytesIO(png))
    _, ax = plt.subplots(figsize=figsize)
    ax.axis("off")
    ax.imshow(img)
    plt.show()
    return None
