"""Custom-namespace registration — polars ``pl.api`` parity
(py-polars/src/polars/api.py: register_expr_namespace :74,
register_dataframe_namespace, register_lazyframe_namespace,
register_series_namespace).

A registered class is attached as a descriptor: accessing
``expr.<name>`` instantiates it with the host object, exactly like the
built-in ``.str`` / ``.dt`` namespaces.  DataFrame and LazyFrame share one
registry here because this engine's eager API is the lazy API (Spark is
always lazy; see SURVEY.md §3.3).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TypeVar
from warnings import warn

NS = TypeVar("NS")

__all__ = [
    "register_expr_namespace",
    "register_dataframe_namespace",
    "register_lazyframe_namespace",
    "register_series_namespace",
]

_RESERVED = {
    "str", "dt", "list", "arr", "struct", "cat", "bin", "name", "meta",
}


class _NameSpace:
    """Descriptor: instantiates the registered class with the host object."""

    def __init__(self, name: str, ns_class: type):
        self._name = name
        self._ns_class = ns_class

    def __get__(self, instance, owner):
        if instance is None:
            return self._ns_class
        return self._ns_class(instance)


def _register(cls: type, name: str) -> Callable[[type[NS]], type[NS]]:
    if name in _RESERVED:
        msg = f"cannot override reserved namespace {name!r}"
        raise AttributeError(msg)

    def deco(ns_class: type[NS]) -> type[NS]:
        if hasattr(cls, name):
            warn(
                f"overriding existing custom namespace {name!r} (on {cls.__name__})",
                UserWarning,
                stacklevel=2,
            )
        setattr(cls, name, _NameSpace(name, ns_class))
        return ns_class

    return deco


def register_expr_namespace(name: str) -> Callable[[type[NS]], type[NS]]:
    """Decorator registering custom functionality on Expr::

        @pl.api.register_expr_namespace("pow_n")
        class PowersOfN:
            def __init__(self, expr): self._expr = expr
            def next(self, p): ...
    """
    from polars_spark.plans.expr import Expr

    return _register(Expr, name)


def register_dataframe_namespace(name: str) -> Callable[[type[NS]], type[NS]]:
    from polars_spark.plans.frame import LazyFrame

    return _register(LazyFrame, name)


def register_lazyframe_namespace(name: str) -> Callable[[type[NS]], type[NS]]:
    from polars_spark.plans.frame import LazyFrame

    return _register(LazyFrame, name)


def register_series_namespace(name: str) -> Callable[[type[NS]], type[NS]]:
    from polars_spark.series import Series

    return _register(Series, name)
