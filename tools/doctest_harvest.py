"""Run the reference py-polars docstring examples against polars_spark.

Harvests every ``>>>`` example from the reference source tree (PUBLIC
reference at /root/reference — examples only, no code copied) and
executes it verbatim with ``polars_spark`` installed as ``pl``.  We
check for *exceptions only* (the printed reprs differ by design:
Spark-backed engine, not a byte-for-byte port).  This is the round-5
user-simulation harness: every uncaught exception is an API-parity gap.

Usage:
    python tools/doctest_harvest.py [glob-substring ...]

With no args, sweeps the standard file set.  Args filter the file list
by substring.  Prints a RESULT line plus the failure histogram.
"""

from __future__ import annotations

import contextlib
import doctest
import glob
import io
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/py-polars/src/polars"

FILES = sorted(
    set(
        glob.glob(f"{REF}/expr/*.py")
        + glob.glob(f"{REF}/series/*.py")
        + glob.glob(f"{REF}/functions/**/*.py", recursive=True)
        + glob.glob(f"{REF}/dataframe/frame.py")
        + glob.glob(f"{REF}/dataframe/group_by.py")
        + glob.glob(f"{REF}/lazyframe/frame.py")
        + glob.glob(f"{REF}/lazyframe/group_by.py")
        + glob.glob(f"{REF}/io/**/*.py", recursive=True)
        + glob.glob(f"{REF}/selectors.py")
        + glob.glob(f"{REF}/sql/*.py")
        + glob.glob(f"{REF}/datatypes/*.py")
        + glob.glob(f"{REF}/api.py")
        + glob.glob(f"{REF}/config.py")
        + glob.glob(f"{REF}/schema.py")
        + glob.glob(f"{REF}/string_cache.py")
        + glob.glob(f"{REF}/convert/*.py")
        + glob.glob(f"{REF}/meta/*.py")
        + glob.glob(f"{REF}/testing/asserts/*.py")
        + glob.glob(f"{REF}/datatype_expr/*.py")
        + glob.glob(f"{REF}/dataframe/plotting.py")
        + glob.glob(f"{REF}/interchange/*.py")
    )
)
# underscore modules are reference-internal helpers, not user API surface
FILES = [f for f in FILES if not f.rsplit("/", 1)[-1].startswith("_")]

SKIP_TOKENS = (
    "plot",
    "style",
    "torch",
    "jax",
    "read_database",
    "scan_delta",
    "scan_iceberg",
    "write_delta",
    "write_iceberg",
    "read_excel",
    "write_excel",
    "read_ods",
    "clipboard",
    "matplotlib",
    "altair",
    "input()",
    "hvplot",
    "register_plugin",
    "read_avro",
    "write_avro",
    "scan_pyarrow_dataset",
    "database_uri",
    "credential",
    "CredentialProvider",
    "s3://",
    "gs://",
    "abfs",
    "GPUEngine",
    "async",
)


def main() -> None:
    parser = doctest.DocTestParser()
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from datetime import date, datetime, time, timedelta

    import polars_spark as pl

    sys.modules.setdefault("polars", pl)
    import polars_spark.selectors as cs

    def _alarm(signum, frame):  # noqa: ARG001
        raise TimeoutError("example watchdog fired")

    signal.signal(signal.SIGALRM, _alarm)

    filters = sys.argv[1:]
    files = [f for f in FILES if not filters or any(s in f for s in filters)]

    ok = err = 0
    fails: dict[str, list[str]] = {}
    per_file: dict[str, list[int]] = {}
    for path in files:
        try:
            src = open(path, encoding="utf8").read()
        except FileNotFoundError:
            continue
        src = src.replace("# doctest: +IGNORE_RESULT", "").replace(
            "# doctest: +SKIP", "#SKIPME"
        )
        try:
            examples = parser.get_examples(src)
        except ValueError:
            continue
        import pathlib
        import tempfile

        dirpath = pathlib.Path(tempfile.mkdtemp(prefix="doctest_io_"))
        g = {
            "pl": pl,
            "cs": cs,
            "np": np,
            "pd": pd,
            "pa": pa,
            "date": date,
            "datetime": datetime,
            "time": time,
            "timedelta": timedelta,
            # the reference's tmp-dir doctest fixtures (write_*/read_* examples)
            "dirpath": dirpath,
            "path": dirpath / "doctest_tmp.dat",
            "buf": io.StringIO(),
        }
        fok = ferr = 0
        for ex in examples:
            code = ex.source
            if "#SKIPME" in code or any(tok in code for tok in SKIP_TOKENS):
                continue
            # examples whose EXPECTED output is a traceback demonstrate a
            # failure on purpose — raising is the correct behavior
            expects_raise = ex.want.lstrip().startswith("Traceback")
            try:
                signal.alarm(90)  # watchdog: skip examples that hang
                with contextlib.redirect_stdout(io.StringIO()):
                    exec(compile(code, "<doc>", "exec"), g)
                ok += 1
                fok += 1
            except SystemExit:
                pass
            except BaseException as e:  # noqa: BLE001
                if expects_raise and not isinstance(e, TimeoutError):
                    ok += 1
                    fok += 1
                    continue
                err += 1
                ferr += 1
                if isinstance(e, TimeoutError):
                    print(
                        f"HANG {path.rsplit('/',1)[-1]}: {code.strip()[:120]}",
                        flush=True,
                    )
                key = f"{type(e).__name__}: {str(e).splitlines()[0][:90] if str(e) else ''}"
                fails.setdefault(key, []).append(
                    path.rsplit("/", 1)[-1] + " | " + code.strip()[:110]
                )
            finally:
                signal.alarm(0)
        per_file[path.replace(REF + "/", "")] = [fok, ferr]

    total = ok + err
    pct = 100.0 * ok / total if total else 0.0
    print(f"RESULT ok: {ok} err: {err} ({pct:.1f}% green)", flush=True)
    print("--- worst files ---")
    for f, (fo, fe) in sorted(per_file.items(), key=lambda kv: -kv[1][1])[:15]:
        if fe:
            print(f"  {f}: ok={fo} err={fe}")
    print("--- failure histogram ---")
    for k, v in sorted(fails.items(), key=lambda kv: -len(kv[1]))[:40]:
        print(f"[{len(v)}] {k}")
        print("    e.g.", v[0].replace(chr(10), " ; "))


if __name__ == "__main__":
    main()
