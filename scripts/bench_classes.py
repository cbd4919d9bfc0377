#!/usr/bin/env python3
"""Per-class s/query decomposition of a Bench JSON artifact.

The inventory mixes query classes with order-of-magnitude different
intrinsic costs (a ref_* parity projection vs a 5-iteration pagerank vs
a query that COMMITS an index mid-flight). A single headline s/query
therefore moves whenever the composition changes, not only when
something regresses — this table is the mechanical decomposition that
separates the two (verdict r8 task #8), reused by bench_diff.

Classes (first match wins; membership is intentionally name-driven so
the split is stable across rounds and needs no plan introspection):
  parity       ref_* — the reference-pipeline parity family
  index-build  queries that commit/serve a persisted artifact inside
               the timed query (snapshot tables, BM25/IVF/graph stores)
  iterative    fixed-round loops (pagerank, k-core, BFS, LPA/modularity,
               components, tokenizer/quality trainers, recall curves
               that build several indexes)
  analytic     everything else — one-shot relational/window/dedup/text

Usage: python3 scripts/bench_classes.py <bench.json>
"""
import json
import re
import sys

INDEX_BUILD = re.compile(
    r"(_persist|_append|_delete|_compact)$"
    r"|^q_graph_(persist|append|serve_)"
    r"|^q_(time_travel|snapshot_prune|partition_evolution)$"
    r"|^q_snapshot_(merge|merge_evolved|schema_evolution|tag|partition_evolution|sql|sql_dml|delete_mor)$"
    r"|^(text_unigram_serve|emb_knn_graph)$"
    r"|^q_dq_(quarantine|audit_history|readmission)$"
    r"|^q_raw_compaction$"
    r"|^dedup_incremental$")
ITERATIVE = re.compile(
    r"pagerank|kcore|components|graph_bfs|label_propagation|modularity"
    r"|bpe_|unigram|quality_train|recall_at_k|nprobe")


def classify(name):
    if name.startswith("ref_"):
        return "parity"
    if INDEX_BUILD.search(name):
        return "index-build"
    if ITERATIVE.search(name):
        return "iterative"
    return "analytic"


CLASSES = ["parity", "analytic", "index-build", "iterative"]


def decompose(queries):
    """{class: (n, total_sec)} over non-error entries."""
    out = {c: [0, 0.0] for c in CLASSES}
    for name, t in queries.items():
        if t is None or t < 0:
            continue
        c = classify(name)
        out[c][0] += 1
        out[c][1] += t
    return {c: (n, tot) for c, (n, tot) in out.items()}


def table(queries):
    rows = decompose(queries)
    lines = [f"{'class':<12} {'n':>4} {'total_s':>9} {'s_per_q':>8}"]
    for c in CLASSES:
        n, tot = rows[c]
        spq = tot / n if n else 0.0
        lines.append(f"{c:<12} {n:>4} {tot:>9.1f} {spq:>8.3f}")
    n_all = sum(n for n, _ in rows.values())
    t_all = sum(t for _, t in rows.values())
    lines.append(f"{'ALL':<12} {n_all:>4} {t_all:>9.1f} "
                 f"{t_all / n_all if n_all else 0.0:>8.3f}")
    return "\n".join(lines)


if __name__ == "__main__":
    with open(sys.argv[1]) as f:
        d = json.load(f)
    print(table(d.get("queries", {})))
