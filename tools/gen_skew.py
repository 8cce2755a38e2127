"""Generate a zipf-skewed variant of sf0.1 for the shuffle-skew stress
bench (round-8 VERDICT item 3).

All sf1.0 keys are uniform by construction (gen_sf1.py key-remaps disjoint
copies), so nothing ever stressed AQE's skew handling.  This variant makes
ONE order hot: ~20% of lineitem rows are reassigned to the smallest
o_orderkey (their l_orderkey only — other columns untouched), and ~20% of
events rows to the smallest user_id.  That is the boilerplate-mega-cluster
shape for the q3/q9/q21-class joins and the per-key window family.

Usage: python tools/gen_skew.py [out_dir]   (default /root/repo/testdata_skew)
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
HOT_SHARE = 5  # every 5th row -> hot key (20%)


def skew_column(tbl: pa.Table, col: str) -> pa.Table:
    hot = pc.min(tbl[col]).as_py()
    n = len(tbl)
    idx = pa.array([i % HOT_SHARE == 0 for i in range(n)])
    newcol = pc.if_else(idx, pa.scalar(hot, type=tbl[col].type), tbl[col])
    return tbl.set_column(tbl.schema.get_field_index(col), col, newcol)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_skew"
    os.makedirs(out, exist_ok=True)
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        src = f"{SRC}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if t == "lineitem":
            pq.write_table(skew_column(pq.read_table(src), "l_orderkey"), dst)
        elif t == "events":
            pq.write_table(skew_column(pq.read_table(src), "user_id"), dst)
        else:
            shutil.copyfile(src, dst)
        print("wrote", dst)


if __name__ == "__main__":
    main()
