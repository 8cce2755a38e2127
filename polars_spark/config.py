"""pl.Config / pl.StringCache / pl.CompatLevel parity.

Config (reference py-polars/src/polars/config.py) is a display/behavior
option store usable as a context manager, decorator, or via classmethod
setters.  The options that have a meaning on this engine are honored
(tbl_rows drives LazyFrame.show, verbose toggles plan printing); the rest
are accepted and stored so user code written against polars runs
unchanged.
"""

from __future__ import annotations

from typing import Any

__all__ = ["Config", "StringCache", "CompatLevel"]

_DEFAULTS: dict[str, Any] = {
    "tbl_rows": 10,
    "tbl_cols": 8,
    "fmt_str_lengths": 30,
    "verbose": False,
    "streaming_chunk_size": None,
    "fmt_float": "mixed",
}

_state: dict[str, Any] = dict(_DEFAULTS)


def get_option(name: str, default=None):
    return _state.get(name, default)


class _ConfigMeta(type):
    def __getattr__(cls, name: str):
        # accept every polars set_* / unset_* knob; unknown ones are stored
        # verbatim so downstream polars-style code never breaks
        if name.startswith("set_"):
            key = name[4:]

            def setter(value=True):
                _state[key] = value
                return cls

            return setter
        if name.startswith("unset_"):
            key = name[6:]

            def unsetter():
                _state.pop(key, None)
                return cls

            return unsetter
        raise AttributeError(name)


class Config(metaclass=_ConfigMeta):
    """Context manager / decorator for scoped option state::

        with pl.Config(tbl_rows=20):
            lf.show()
    """

    def __init__(self, *, restore_defaults: bool = False, **options):
        self._saved = dict(_state)
        if restore_defaults:
            _state.clear()
            _state.update(_DEFAULTS)
        for k, v in options.items():
            _state[k] = v

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        _state.clear()
        _state.update(self._saved)
        return False

    def __call__(self, fn):
        import functools

        saved_opts = {k: _state[k] for k in _state}

        @functools.wraps(fn)
        def wrapper(*a, **kw):
            prev = dict(_state)
            _state.update(saved_opts)
            try:
                return fn(*a, **kw)
            finally:
                _state.clear()
                _state.update(prev)

        return wrapper

    @classmethod
    def state(cls) -> dict:
        return dict(_state)

    @classmethod
    def restore_defaults(cls):
        _state.clear()
        _state.update(_DEFAULTS)
        return cls


class StringCache:
    """Context manager mirroring pl.StringCache.  Categoricals are plain
    strings on this engine (SURVEY §1.2 — no global dictionary), so the
    cache is semantically a no-op; the context is provided so polars code
    using `with pl.StringCache():` runs unchanged."""

    def __enter__(self):
        from polars_spark.sources import enable_string_cache

        enable_string_cache()
        return self

    def __exit__(self, *exc):
        from polars_spark.sources import disable_string_cache

        disable_string_cache()
        return False


class CompatLevel:
    """Arrow compatibility level (reference interchange CompatLevel) —
    this engine always speaks current Arrow; both levels are accepted."""

    def __init__(self, level: int = 1):
        self._level = level

    @classmethod
    def newest(cls) -> "CompatLevel":
        return cls(1)

    @classmethod
    def oldest(cls) -> "CompatLevel":
        return cls(0)
