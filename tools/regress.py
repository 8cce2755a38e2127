"""Round-over-round bench regression triage (VERDICT r11 next-round #8).

With operator coverage closed, the dominant round-12+ risk is silent
regression.  Every round so far the ">1.25x mover: box drift or code
change?" triage happened by hand (git archaeology per mover — see the
r10 dedup_embedding_cosine 1.41x that turned out to be drift).  This
tool mechanizes it:

1. Load two bench records (default: the two newest ``BENCH_r*.json`` in
   the repo root; or two explicit paths; or ``--run`` to execute
   ``bench.py`` fresh and compare against the newest record).
2. Compute per-query ratios over the shared query set; movers are
   ratio > 1.25 (slower) or < 0.80 (faster).
3. For each mover, correlate against the git log since the older
   record's commit: the set of changed ``polars_spark/`` files is
   intersected with the query's implementation footprint —
   its defining ``queries/*.py`` module (by source file), plus any
   engine module whose dotted name appears in the query function's
   source (``llm``, ``multimodal``, ``streaming``...).  Changes under
   ``plans/``, ``sources/``, ``functions/`` or ``session.py`` are
   engine-core: they conservatively correlate with EVERY query.
4. Verdict per mover: ``code-correlated (files...)`` or ``drift
   (no engine change in this query's path)``.

The output is a starting point for bisection, not a proof: a
core-engine round flags every mover, which is exactly the honest
conservative read.  Exit code 1 if any SLOWER mover is code-correlated
(the "look at this before shipping" signal).

Usage:
    python tools/regress.py                    # two newest BENCH_r*.json
    python tools/regress.py A.json B.json      # explicit old new
    python tools/regress.py --run              # fresh bench vs newest
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

SLOW, FAST = 1.25, 0.80

# Bench records known to be contention-poisoned (VERDICT r12: the driver's
# 32-core r12 run read 5.8x slow on a degraded box while its OWN 8-core run
# of the same HEAD matched r11).  When one of these is the "old" side, every
# ratio is re-annotated against the honest quiet reference so a ~5x "geomean
# improvement" vs the inflated record is auto-flagged as a baseline artifact,
# not credited as a code win.
POISONED_REFS = {
    "BENCH_r12.json": (
        "plans/r12/bench_r12_close_best3.json",  # builder quiet best-of-3, 47.66s
        "BENCH_r12_c8.json",                     # driver's own 8-core run, 65.6s
    ),
}
CORE_PREFIXES = (
    "polars_spark/plans/",
    "polars_spark/sources/",
    "polars_spark/functions/",
    "polars_spark/session.py",
)


def _load(path: str) -> tuple[dict, str | None]:
    """(queries dict, commit that added the file or None)."""
    with open(path) as f:
        d = json.load(f)
    q = d.get("parsed", d).get("queries", {})
    commit = None
    rel = os.path.relpath(path, ROOT)
    try:
        out = subprocess.run(
            ["git", "log", "--diff-filter=A", "--format=%H", "--", rel],
            cwd=ROOT,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
        commit = out[0] if out else None
    except Exception:
        pass
    return q, commit


def _changed_since(commit: str | None) -> list[str]:
    if not commit:
        return []
    try:
        out = subprocess.run(
            ["git", "diff", "--name-only", f"{commit}..HEAD", "--", "polars_spark"],
            cwd=ROOT,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
        return sorted(set(out))
    except Exception:
        return []


def _footprint(qname: str) -> tuple[str | None, set[str]]:
    """(defining file rel path, set of engine module tokens in source)."""
    from polars_spark.queries import QUERIES

    fn = QUERIES.get(qname)
    if fn is None:
        return None, set()
    try:
        src_file = os.path.relpath(inspect.getsourcefile(fn), ROOT)
        src = inspect.getsource(fn)
    except Exception:
        return None, set()
    toks = set(re.findall(r"polars_spark\.(\w+)", src))
    toks |= set(re.findall(r"from polars_spark import (\w+)", src))
    return src_file, toks


def _correlate(qname: str, changed: list[str]) -> list[str]:
    hits = [f for f in changed if f.startswith(CORE_PREFIXES)]
    src_file, toks = _footprint(qname)
    for f in changed:
        if src_file and f == src_file:
            hits.append(f)
        else:
            mod = f.removeprefix("polars_spark/").split("/")[0].removesuffix(".py")
            if mod in toks:
                hits.append(f)
    return sorted(set(hits))


def main(argv: list[str]) -> int:
    args = [a for a in argv if not a.startswith("--")]
    run_fresh = "--run" in argv
    records = sorted(
        glob.glob(os.path.join(ROOT, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    if len(args) == 2:
        old_p, new_p = args
    elif run_fresh:
        if not records:
            print("no BENCH_r*.json to compare against")
            return 2
        old_p = records[-1]
        env = dict(os.environ)
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            cwd=ROOT,
            capture_output=True,
            text=True,
            env=env,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print("bench.py produced no JSON line", file=sys.stderr)
            print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
            return 2
        new_p = os.path.join(ROOT, ".regress_fresh.json")
        with open(new_p, "w") as f:
            f.write(line[-1])
    else:
        if len(records) < 2:
            print("need two BENCH_r*.json records")
            return 2
        old_p, new_p = records[-2], records[-1]

    old_q, old_commit = _load(old_p)
    new_q, _ = _load(new_p)
    changed = _changed_since(old_commit)
    shared = [q for q in new_q if q in old_q]
    print(
        f"# {os.path.basename(old_p)} -> {os.path.basename(new_p)}: "
        f"{len(shared)} shared queries; {len(changed)} engine files changed "
        f"since {old_commit[:9] if old_commit else '?'}"
    )
    total_old = sum(old_q[q] for q in shared)
    total_new = sum(new_q[q] for q in shared)
    print(f"# like-for-like total: {total_old:.2f}s -> {total_new:.2f}s "
          f"({total_new / max(total_old, 1e-9):.2f}x)")
    quiet_q: dict = {}
    for ref in POISONED_REFS.get(os.path.basename(old_p), ()):
        ref_p = os.path.join(ROOT, ref)
        if os.path.exists(ref_p):
            quiet_q, _ = _load(ref_p)
            qt = sum(quiet_q[q] for q in shared if q in quiet_q)
            print(
                f"# WARNING: {os.path.basename(old_p)} is a known "
                f"contention-poisoned record (VERDICT r12). Honest reference "
                f"{ref}: total {qt:.2f}s over shared queries; per-mover "
                f"'quiet' ratios below use it. Improvements vs the poisoned "
                f"record are baseline artifacts unless the quiet ratio agrees."
            )
            break
    bad = 0
    movers = []
    for q in shared:
        r = new_q[q] / max(old_q[q], 1e-9)
        if r > SLOW or r < FAST:
            movers.append((r, q))
    for r, q in sorted(movers, reverse=True):
        hits = _correlate(q, changed)
        verdict = (
            f"code-correlated: {', '.join(hits[:4])}{'...' if len(hits) > 4 else ''}"
            if hits
            else "drift (no engine change in this query's path)"
        )
        flag = "SLOWER" if r > SLOW else "faster"
        if r > SLOW and hits:
            bad += 1
        quiet = ""
        if q in quiet_q:
            qr = new_q[q] / max(quiet_q[q], 1e-9)
            quiet = f"  [quiet ref {quiet_q[q]:.2f}s -> {qr:.2f}x]"
        print(f"{flag:6s} {q:32s} {old_q[q]:7.2f}s -> {new_q[q]:7.2f}s "
              f"({r:.2f}x)  {verdict}{quiet}")
    if not movers:
        print("no movers beyond the 1.25x / 0.80x band")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
