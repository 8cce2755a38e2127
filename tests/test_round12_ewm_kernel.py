"""Round-12 kernel gate: the specialized ewm batch loops
(``_ewm_spec_loop``) must replay the generic ``_ewm_step_*`` /
``_ewm_null_decay`` helpers BIT-EXACTLY (uint64 view compare) — the
optimization round rewrote the streaming kernel's inner loop for speed
(2.6s -> 0.5s at 600k rows x 2 specs) and the DuckDB oracles pin the exact
IEEE sequence, so any drift in op order is a correctness bug, not noise.

Pure pandas/numpy: no SparkSession needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from polars_spark.plans.frame import (
    _ewm_null_decay,
    _ewm_step_mean_adjust,
    _ewm_step_mean_rec,
    _ewm_step_sum,
    _ewm_step_var,
    _ewm_stream_kernel,
)


def _reference_kernel(specs, key_names, srcs, outs, nan_flags):
    """The pre-round-12 generic per-row loop, verbatim semantics: per-row
    dispatch through the _ewm_step_* helpers with state tuples."""

    def init(sp):
        if sp["kind"] == "mean":
            return (0.0, 0.0, 0) if sp.get("adjust", True) else (0.0, 1.0, 0)
        if sp["kind"] == "sum":
            return (0.0, 0)
        if not sp.get("adjust", True):
            return (0.0, 0.0, 1.0, 0.0, 0.0, 0)
        return (0.0, 0.0, 0.0, 0.0, 0)

    def step(sp, st, x):
        if sp["kind"] == "mean":
            f = _ewm_step_mean_adjust if sp.get("adjust", True) else _ewm_step_mean_rec
            return f(st, x, sp["decay"], sp.get("alpha"), sp.get("min_samples", 1))
        if sp["kind"] == "sum":
            return _ewm_step_sum(st, x, sp["decay"], sp.get("alpha"), sp.get("min_samples", 1))
        return _ewm_step_var(
            st, x, sp["decay"], sp.get("alpha"), sp.get("min_samples", 1),
            bias=sp.get("bias", False), std=sp["kind"] == "std",
            adjust=sp.get("adjust", True),
        )

    def run(batches):
        cur = object()
        states: list = []
        for pdf in batches:
            n = len(pdf)
            if key_names:
                kcols = [pdf[k].astype(object).where(pdf[k].notna(), None) for k in key_names]
                keys = list(zip(*[kc.tolist() for kc in kcols]))
            else:
                keys = None
            xss = [pdf[s_].to_numpy(dtype=float) for s_ in srcs]
            nanss = (
                [pdf[f_].fillna(False).to_numpy(dtype=bool) for f_ in nan_flags]
                if nan_flags is not None
                else None
            )
            outcols = [[None] * n for _ in outs]
            for i in range(n):
                k = keys[i] if keys is not None else ()
                if k != cur:
                    cur = k
                    states = [init(sp) for sp in specs]
                for j, sp in enumerate(specs):
                    x = xss[j][i]
                    if x != x and (nanss is None or not nanss[j][i]):
                        if not sp.get("ignore_nulls", True):
                            states[j] = _ewm_null_decay(sp, states[j])
                        continue
                    v, states[j] = step(sp, states[j], x)
                    outcols[j][i] = v
            for o, vals in zip(outs, outcols):
                vnp = np.array([0.0 if v is None else v for v in vals], dtype="float64")
                mask = np.array([v is None for v in vals], dtype=bool)
                pdf[o] = pd.arrays.FloatingArray(vnp, mask)
            yield pdf

    return run


def _gen_batches(rng, n_rows, n_batch, with_keys, n_specs):
    srcs = [f"s{j}" for j in range(n_specs)]
    nans = [f"nf{j}" for j in range(n_specs)]
    bs = []
    keys = np.sort(rng.randint(0, max(2, n_rows // 7), n_rows)) if with_keys else None
    x = rng.uniform(-100, 100, (n_specs, n_rows))
    isnull = rng.rand(n_specs, n_rows) < 0.1
    isnan = (rng.rand(n_specs, n_rows) < 0.05) & ~isnull
    x[isnull] = np.nan
    x[isnan] = np.nan
    for i in range(0, n_rows, n_batch):
        d = {}
        if with_keys:
            d["k"] = keys[i : i + n_batch]
        for j in range(n_specs):
            d[srcs[j]] = x[j, i : i + n_batch]
            d[nans[j]] = isnan[j, i : i + n_batch]
        bs.append(pd.DataFrame(d))
    return bs, srcs, nans


@pytest.mark.parametrize("kind", ["mean", "sum", "var", "std"])
@pytest.mark.parametrize("adjust", [True, False])
@pytest.mark.parametrize("ignore_nulls", [True, False])
@pytest.mark.parametrize("with_keys", [True, False])
def test_specialized_kernel_bit_exact(kind, adjust, ignore_nulls, with_keys):
    rng = np.random.RandomState(hash((kind, adjust, ignore_nulls, with_keys)) % 2**31)
    for bias in [True, False] if kind in ("var", "std") else [None]:
        for minp in (1, 3):
            sp = {
                "kind": kind,
                "decay": 0.8,
                "alpha": 0.2,
                "min_samples": minp,
                "adjust": adjust,
                "ignore_nulls": ignore_nulls,
            }
            if bias is not None:
                sp["bias"] = bias
            specs = [sp, dict(sp)]
            # batch size 97 over 523 rows forces state carry across batches
            bs, srcs, nans = _gen_batches(rng, 523, 97, with_keys, 2)
            key_names = ["k"] if with_keys else []
            outs = ["o0", "o1"]
            ref = pd.concat(
                list(
                    _reference_kernel(specs, key_names, srcs, outs, nans)(
                        iter([b.copy() for b in bs])
                    )
                ),
                ignore_index=True,
            )
            got = pd.concat(
                list(
                    _ewm_stream_kernel(specs, key_names, srcs, outs, nans)(
                        iter([b.copy() for b in bs])
                    )
                ),
                ignore_index=True,
            )
            for o in outs:
                rv = ref[o].to_numpy(dtype=float)
                gv = got[o].to_numpy(dtype=float)
                assert np.array_equal(rv.view(np.uint64), gv.view(np.uint64)), (sp, o)
                assert ref[o].isna().equals(got[o].isna()), (sp, o)
