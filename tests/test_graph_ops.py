"""Hand-computed semantics for ops/graph.py on tiny known graphs."""

from easyner_spark.ops.graph import pagerank, triangles, two_hop_reach


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_one_iteration_hand_computed(spark):
    # A->B, A->C, B->C, C->A; scale=100 so the integer math is checkable:
    # contribs: A sends 50 to B and C, B sends 100 to C, C sends 100 to A
    # new = 15 + 85*in_sum div 100 -> A:100, B:57, C:142
    e = _edges(spark, [("A", "B"), ("A", "C"), ("B", "C"), ("C", "A")])
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(e, iterations=1, scale=100).collect()
    }
    assert got == {"A": 100, "B": 57, "C": 142}


def test_pagerank_sink_keeps_base_rank(spark):
    # B is a sink (dangling): it receives but never sends; A receives
    # nothing so it decays to base + 0 after the first round.
    e = _edges(spark, [("A", "B")])
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(e, iterations=2, scale=10**6).collect()
    }
    assert got["A"] == 150_000  # base only
    # round1: B = 150000 + 85% of 1e6 = 1000000; round2: from A's 150000
    assert got["B"] == 150_000 + 85 * 150_000 // 100


def test_triangles_counts_each_corner_once(spark):
    # triangle A-B-C plus pendant edge C-D: each triangle corner counts 1,
    # D participates in none (absent from the result)
    e = _edges(spark, [("A", "B"), ("B", "C"), ("C", "A"), ("C", "D")])
    got = {r["node"]: r["n_triangles"] for r in triangles(e).collect()}
    assert got == {"A": 1, "B": 1, "C": 1}


def test_triangles_direction_and_duplicates_ignored(spark):
    # same triangle expressed with reversed/duplicate edges: still one
    e = _edges(
        spark,
        [("B", "A"), ("A", "B"), ("C", "B"), ("A", "C"), ("C", "A")],
    )
    got = {r["node"]: r["n_triangles"] for r in triangles(e).collect()}
    assert got == {"A": 1, "B": 1, "C": 1}


def test_two_hop_excludes_self_and_direct(spark):
    # path A-B-C-D: two-hop pairs are exactly (A,C),(B,D) both ways
    e = _edges(spark, [("A", "B"), ("B", "C"), ("C", "D")])
    got = {r["node"]: r["n_two_hop"] for r in two_hop_reach(e).collect()}
    assert got == {"A": 1, "B": 1, "C": 1, "D": 1}


def test_two_hop_triangle_is_empty(spark):
    # complete triangle: every 2-path lands on a direct neighbor
    e = _edges(spark, [("A", "B"), ("B", "C"), ("C", "A")])
    assert two_hop_reach(e).count() == 0
