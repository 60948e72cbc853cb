"""Golden-pinned oracles: queries deterministic WITHIN Spark but not
SQL-derivable cross-engine.

Honest framing (same contract as ``sample_deterministic``): these oracles do
NOT re-derive the answer in DuckDB — they replay a COMMITTED golden of Spark's
own deterministic output, frozen per known sf tier and keyed by the pinning
table's row count. The driver's hash compare then becomes a true
reproducibility check instead of a rows-only count. An unknown tier selects
zero golden rows → a loud mismatch, never a silent pass.

Three determinism classes earn a golden (each query's docstring says which):

* order-independent sketches — HLL register merges are max-per-register,
  commutative and associative, so the estimate is a pure function of the data
  SET on any partitioning (``agg_approx_distinct``, ``agg_hll_sketch_merge``);
* seeded per-row randomness — Spark ML LSH draws its hash coefficients from
  the seed alone at fit(); hashing, bucket collision joins and distance
  filters are all per-row/per-pair, so partitioning never enters
  (``dedup_minhash_lsh``, ``sim_ann_lsh``, ``sim_ann_batch_topk``);
* order-canonicalized sketches — merge-order-dependent summaries pinned by
  canonicalizing the input first (orderBy unique key + coalesce(1), the
  ``sample_deterministic`` trick) so the sequential update order is total
  (``agg_approx_quantile``, ``agg_histogram_numeric``,
  ``agg_kll_quantile_sketch`` via the seeded from-scratch KLL in
  operators/sketch.py, ``sim_ann_ivf``/``sim_semantic_dedup`` via
  canonical_fit k-means training);
* seed-fixed fixtures not derivable in SQL — the delivery pipeline's
  encrypted fixtures are wholly determined by seed=42 and DuckDB cannot
  decrypt AES-CTR, so the exact output is pinned instead of left rows-only
  (``pipeline_delivery_e2e``).

The committed data lives in ``goldens_data.py``, REGENERATED — never
hand-edited — by ``tools/gen_goldens.py``, which runs the very ``queries()``
entries it pins at every known tier and freezes their output. Stability across
partition counts, core counts (local[8] vs local[32]) and repartitionings was
verified before each query was admitted here. (The formerly rows-only
DataSketches KLL — unseeded compaction RNG — was replaced in round 11 by the
seeded reimplementation precisely so this lane could attest it.)
"""

from __future__ import annotations

from .goldens_data import GOLDEN_DATA


def golden_oracle(name: str) -> str:
    """Build the replay SQL for one golden-pinned query.

    All golden cells are stored as strings; the SELECT casts them to the
    query's real column types. Doubles are stored as ``repr()`` (shortest
    round-trip form) and go through CAST(VARCHAR AS DOUBLE) — correctly
    rounded in DuckDB, so the binary double is reproduced bit-exactly.
    Array<double> columns are stored '|'-joined and rebuilt via
    list_transform. A sentinel (-1, NULL…) row keeps the VALUES clause valid
    while a tier is still ungenerated; tier_rows = -1 never matches a COUNT.
    """
    if name not in GOLDEN_DATA:
        # declared before its first gen_goldens run: a ONE-ROW sentinel with
        # a schema no real query produces — a LOUD mismatch until the golden
        # is generated, even against a query that happens to return 0 rows
        # (a WHERE FALSE fallback would silently pass that case)
        return "SELECT 'UNGENERATED GOLDEN (run tools/gen_goldens.py --add)' AS ungenerated_golden"
    spec = GOLDEN_DATA[name]
    cols = spec["columns"]
    value_rows = ["(-1" + ", NULL" * len(cols) + ")"]
    for tier in sorted(spec["tiers"]):
        for row in spec["tiers"][tier]:
            cells = ", ".join("'" + str(v).replace("'", "''") + "'" for v in row)
            value_rows.append(f"({tier}, {cells})")
    col_names = ", ".join(c for c, _ in cols)
    selects = []
    for c, t in cols:
        if t == "DOUBLE_LIST":
            selects.append(
                f"list_transform(string_split({c}, '|'), x -> CAST(x AS DOUBLE)) AS {c}"
            )
        elif t == "VARCHAR":
            selects.append(c)
        else:
            selects.append(f"CAST({c} AS {t}) AS {c}")
    values_sql = ",\n      ".join(value_rows)
    select_sql = ", ".join(selects)
    return (
        f"\n    WITH golden(tier_rows, {col_names}) AS (VALUES\n"
        f"      {values_sql}\n"
        f"    )\n"
        f"    SELECT {select_sql}\n"
        f"    FROM golden WHERE tier_rows = (SELECT COUNT(*) FROM {spec['key_table']})\n    "
    )
