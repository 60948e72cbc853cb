"""Sweep every oracle_sql() final schema for dtype divergence risk.

Round-9 verdict root cause: DuckDB windows/SUMs over BIGINT produce HUGEINT,
which pandas renders as float64 ("162.0") while Spark emits int64 ("162").
The driver's value-hasher sees those as different; the builder's normalizer
canonicalized integral floats so SELFCHECK could not.

This tool runs `DESCRIBE <oracle sql>` on DuckDB (no data movement) and flags
any final column whose DuckDB type is HUGEINT, UHUGEINT, or DECIMAL — the
types pandas widens to float64/object while Spark's equivalent stays integral.

Usage: python tools/oracle_dtype_sweep.py [sf_dir]
Exit 1 if any flagged column remains — CI-able.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

from snapshot_sender_spark.tables import TABLE_NAMES  # noqa: E402

FLAGGED_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    flagged: list[tuple[str, str, str]] = []
    errors: list[tuple[str, str]] = []
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception:
            # multi-statement oracles (e.g. CREATE MACRO; SELECT) can't be
            # DESCRIBEd directly — run them with LIMIT 0 semantics instead
            try:
                cur = con.execute(sql)
                desc = [(c[0], str(c[1])) for c in zip(
                    [d[0] for d in cur.description],
                    [d[1] for d in cur.description])]
            except Exception as e:
                errors.append((name, f"{type(e).__name__}: {e}"[:200]))
                continue
        for col, typ, *_ in desc:
            typ_u = str(typ).upper()
            if any(typ_u.startswith(ft) for ft in FLAGGED_TYPES):
                flagged.append((name, col, typ_u))

    for name, col, typ in flagged:
        print(f"FLAG {name}.{col}: {typ}")
    for name, err in errors:
        print(f"ERR  {name}: {err}")
    print(f"\n=== {len(flagged)} flagged columns across "
          f"{len({n for n, _, _ in flagged})} queries; {len(errors)} describe-errors "
          f"of {len(oracles)} oracles ===")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
