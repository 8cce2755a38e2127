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

__all__ = ["Config", "StringCache", "CompatLevel", "QueryOptFlags", "GPUEngine", "DEFAULT_QUERY_OPT_FLAGS"]

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

    def __getattr__(self, name: str):
        # instance-level setters (with pl.Config() as cfg: cfg.set_verbose(True))
        if name.startswith(("set_", "unset_")):
            return getattr(type(self), name)
        raise AttributeError(name)

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
    def state(cls, *, if_set: bool = False, env_only: bool = False) -> dict:
        if env_only:
            return {}
        if if_set:
            return {k: v for k, v in _state.items() if _DEFAULTS.get(k, None) != v}
        return dict(_state)

    @classmethod
    def save(cls) -> str:
        """The current option state as a JSON string (reference
        Config.save) — round-trips through Config.load."""
        import json

        return json.dumps({"environment": {}, "direct": dict(_state)})

    @classmethod
    def save_to_file(cls, file) -> None:
        with open(file, "w", encoding="utf8") as f:
            f.write(cls.save())

    @classmethod
    def load(cls, cfg: str):
        import json

        data = json.loads(cfg)
        _state.update(data.get("direct", data) or {})
        return cls

    @classmethod
    def load_from_file(cls, file):
        with open(file, encoding="utf8") as f:
            return cls.load(f.read())

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


class QueryOptFlags:
    """Per-query optimization toggles (reference lazyframe/opt_flags.py:25).

    Accepted by ``collect(optimizations=...)`` for drop-in compatibility.
    On this engine every listed optimization is CATALYST's job — predicate/
    projection pushdown, expression simplification, slice pushdown, common-
    subplan elimination (exchange reuse) run inside the Spark optimizer and
    cannot be usefully switched off per query; the flags are recorded and
    readable, and ``collapse_joins=False``-style requests are no-ops by
    design (documented divergence, not an oversight)."""

    _FLAGS = (
        "predicate_pushdown",
        "projection_pushdown",
        "simplify_expression",
        "slice_pushdown",
        "comm_subplan_elim",
        "comm_subexpr_elim",
        "cluster_with_columns",
        "collapse_joins",
        "check_order_observe",
        "fast_projection",
    )

    def __init__(self, **flags: bool):
        for f in self._FLAGS:
            setattr(self, f, flags.pop(f, True))
        if flags:
            bad = ", ".join(sorted(flags))
            raise TypeError(f"unknown optimization flags: {bad}")

    @classmethod
    def none(cls) -> "QueryOptFlags":
        return cls(**{f: False for f in cls._FLAGS})

    def no_optimizations(self) -> None:
        for f in self._FLAGS:
            setattr(self, f, False)

    def update(self, **flags: bool) -> "QueryOptFlags":
        for k, v in flags.items():
            if k not in self._FLAGS:
                raise TypeError(f"unknown optimization flag: {k}")
            setattr(self, k, v)
        return self

    def __copy__(self) -> "QueryOptFlags":
        return QueryOptFlags(**{f: getattr(self, f) for f in self._FLAGS})

    def __repr__(self) -> str:
        on = [f for f in self._FLAGS if getattr(self, f)]
        return f"QueryOptFlags({', '.join(on)})"


DEFAULT_QUERY_OPT_FLAGS = QueryOptFlags()


class GPUEngine:
    """reference lazyframe/engine_config.py:11 — cuDF engine configuration.

    Spark has no cuDF backend; accepted for drop-in compatibility and
    collect(engine=...) runs the (always-distributed) Spark plan.  The
    config dict is preserved so callers can introspect what they asked for."""

    def __init__(self, *, device: int | None = None, memory_resource=None, **config):
        self.device = device
        self.memory_resource = memory_resource
        self.config = config
