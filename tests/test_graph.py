"""PageRank power iteration: equivalence with a pure-Python reference."""

from __future__ import annotations

from mongodb_cdc_delta_spark.ops.graph import DAMPING, pagerank


def ref_pagerank(edges, iters):
    sym = set()
    for a, b in edges:
        sym.add((a, b))
        sym.add((b, a))
    verts = sorted({a for a, _ in sym})
    n = len(verts)
    deg = {v: sum(1 for a, _ in sym if a == v) for v in verts}
    rank = {v: 1.0 / n for v in verts}
    for _ in range(iters):
        mass = {v: 0.0 for v in verts}
        for a, b in sym:
            mass[b] += rank[a] / deg[a]
        rank = {
            v: (1.0 - DAMPING) / n + DAMPING * mass[v] for v in verts
        }
    return rank


def test_matches_reference_on_small_graph(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 6)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.id: r.rank for r in pagerank(df, iters=5).collect()}
    exp = ref_pagerank(edges, 5)
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9, v
    # hub vertex 3 (highest degree) outranks everything
    assert max(exp, key=exp.get) == 3
    assert max(got, key=got.get) == 3


def test_ranks_sum_to_one(spark):
    edges = [(1, 2), (2, 3), (1, 3), (4, 5)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    total = sum(r.rank for r in pagerank(df, iters=8).collect())
    assert abs(total - 1.0) < 1e-9
