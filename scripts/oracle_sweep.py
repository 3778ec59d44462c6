"""Local replica of the driver's correctness gate: run every
``__ray_entry__.queries()`` entry at a given sf tier and compare
against its ``oracle_sql()`` DuckDB result (sorted columns, sorted
rows, value equality) — queries without an oracle get a rows-only
check. Prints one report line per query, a JSON summary, and
``BAD: [...]`` naming any mismatches.

    PYTHONPATH=/root/repo python scripts/oracle_sweep.py [sf_dir]

(PYTHONPATH matters: Ray workers import datacapsule_ray from the
environment, not from the driver's sys.path.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb
    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as em

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    def to_df(res):
        import pyarrow as pa

        from ray.data import Dataset

        if isinstance(res, Dataset):
            return res.to_pandas()
        if isinstance(res, pa.Table):
            return res.to_pandas()
        return res

    def canon(df):
        df = df[sorted(df.columns)].copy()
        return df.sort_values(list(df.columns),
                              kind="stable").reset_index(drop=True)

    def frame_hash(df):
        """Representation-sensitive value hash, mirroring the driver's
        gate: int64 123 and float64 123.0 must hash DIFFERENTLY (that
        skew passed the value compare but failed the driver in round 3
        — user_rolling_value, HUGEINT→float64). Floats are rounded to
        9 decimals first so distributed-summation ulp noise does not
        produce spurious mismatches."""
        import hashlib

        import numpy as np

        h = hashlib.md5()
        for c in df.columns:
            col = df[c]
            if col.dtype.kind == "f":
                vals = np.round(col.to_numpy(), 9)
                rep = "|".join(f"{v:.9f}" for v in vals)
            else:
                rep = "|".join(str(v) for v in col.tolist())
            h.update(f"{c}#{rep}\n".encode())
        return h.hexdigest()

    qs, osql = em.queries(), em.oracle_sql()
    report: dict[str, object] = {}
    bad: list[str] = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            rdf = to_df(fn(sf))
            if name not in osql:
                report[name] = "rows-only"
                print(f"ok   {name}: rows-only ({len(rdf)} rows, "
                      f"{time.time() - t0:.1f}s)")
                continue
            odf = con.sql(osql[name]).df()
            a, b = canon(rdf), canon(odf)
            ok = (len(a) == len(b)
                  and list(a.columns) == list(b.columns))
            values_ok = ok
            if values_ok:
                try:
                    pd.testing.assert_frame_equal(
                        a, b, check_dtype=False, check_exact=False,
                        rtol=1e-6, atol=1e-9)
                except AssertionError:
                    values_ok = False
            hash_ok = values_ok and frame_hash(a) == frame_hash(b)
            report[name] = bool(hash_ok)
            if not hash_ok:
                bad.append(name)
                if values_ok:
                    print(f"FAIL {name}: DTYPE-SKEW — values match but "
                          f"representation hash differs "
                          f"(ray {dict(a.dtypes.astype(str))} vs "
                          f"oracle {dict(b.dtypes.astype(str))})")
                else:
                    print(f"FAIL {name}: rows {len(a)} vs {len(b)}, "
                          f"cols {list(a.columns)} vs {list(b.columns)}")
            else:
                print(f"ok   {name}: {len(a)} rows match "
                      f"({time.time() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 — report and continue
            report[name] = {"ok": False, "err": repr(e)[:200]}
            bad.append(name)
            print(f"FAIL {name}: {e!r}"[:300])
    print(json.dumps(report))
    print("BAD:", bad)
    ray.shutdown()
    if bad:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
