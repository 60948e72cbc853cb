"""Regenerate QUERIES.md: the full declared-query index grouped by category,
with each query's one-line description and oracle status.
Usage: python tools/gen_queries_index.py"""

from __future__ import annotations

import sys
from collections import defaultdict

sys.path.insert(0, ".")

from snapshot_sender_spark.queries import all_queries  # noqa: E402

CATEGORY_TITLES = [
    ("tpch", "TPC-H classics"),
    ("relational", "Relational"),
    ("filter", "Projection / filter"),
    ("join", "Joins"),
    ("aggregation", "Aggregations"),
    ("agg", "Aggregations (cont.)"),
    ("window", "Window functions"),
    ("sort", "Sort / top-k"),
    ("setop", "Set operations"),
    ("set", "Set operations (cont.)"),
    ("sql", "SQL surface"),
    ("string", "String functions"),
    ("scalar-string", "String functions (scalar)"),
    ("scalar-date", "Date/time functions"),
    ("scalar-math", "Math functions"),
    ("math", "Math functions (cont.)"),
    ("scalar-array", "Array functions"),
    ("array", "Array functions (cont.)"),
    ("scalar-map", "Map functions"),
    ("scalar-json", "JSON functions"),
    ("json", "JSON functions (cont.)"),
    ("scalar-null", "Null handling"),
    ("scalar-try", "TRY_ conversions"),
    ("scalar-codec", "Codec functions"),
    ("scalar-crypto", "Crypto functions"),
    ("variant", "VARIANT"),
    ("xml", "XML"),
    ("source", "Sources / formats"),
    ("sampling", "Sampling"),
    ("cdc", "CDC / upsert"),
    ("control-plane", "Control plane"),
    ("streaming", "Structured Streaming"),
    ("udtf", "UDTF surface"),
    ("llm-dedup", "LLM: deduplication"),
    ("llm-similarity", "LLM: similarity search"),
    ("llm-text", "LLM: text analysis"),
    ("llm-curation", "LLM: corpus curation"),
    ("curation", "LLM: corpus curation (cont.)"),
    ("llm-multimodal", "LLM: multimodal"),
    ("llm-pipeline", "LLM: end-to-end pipelines"),
    ("pipeline", "Delivery pipeline"),
    ("analytics", "Analytics patterns"),
    ("graph", "Graph"),
    ("layout", "Storage layout"),
    ("quality", "Data quality"),
    ("pandas-api", "pandas API on Spark"),
]


def first_line(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.strip().split())
    return text if len(text) <= 160 else text[:157] + "..."


def main() -> None:
    qs = all_queries()
    by_cat = defaultdict(list)
    for name, qd in sorted(qs.items()):
        by_cat[qd.category].append(qd)
    n_oracle = sum(1 for q in qs.values() if q.oracle is not None)

    out = [
        "# QUERIES — the declared query surface",
        "",
        f"{len(qs)} queries; {n_oracle} DuckDB-oracle hash-matched, "
        f"{len(qs) - n_oracle} rows-only (approximate/stateful by design). "
        "Regenerate with `python tools/gen_queries_index.py`. "
        "Each entry is a `queries()` key in `__spark_entry__.py`; "
        "descriptions are the implementation docstrings.",
        "",
    ]
    seen = set()
    ordered = [c for c, _ in CATEGORY_TITLES if c in by_cat]
    ordered += [c for c in sorted(by_cat) if c not in {x for x, _ in CATEGORY_TITLES}]
    titles = dict(CATEGORY_TITLES)
    for cat in ordered:
        if cat in seen:
            continue
        seen.add(cat)
        out.append(f"## {titles.get(cat, cat)} ({len(by_cat[cat])})")
        out.append("")
        for qd in by_cat[cat]:
            tag = "" if qd.oracle is not None else " *(rows-only)*"
            desc = first_line(qd.fn.__doc__) or (
                qd.name.replace("_", " ") + f" (`{qd.fn.__module__.rsplit('.', 1)[-1]}.py`)"
            )
            out.append(f"- **{qd.name}**{tag} — {desc}")
        out.append("")
    with open("QUERIES.md", "w") as fh:
        fh.write("\n".join(out))
    print(f"QUERIES.md regenerated: {len(qs)} queries, {len(seen)} categories")


if __name__ == "__main__":
    main()
