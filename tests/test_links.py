"""Unit tests for the link-graph tier (functions/links.py): anchor
extraction from raw bytes, href resolution, host aggregation, and
PageRank semantics on graphs small enough to verify by hand."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ocr_automation_system_spark.functions.links import (
    extract_links, host_graph, page_html, pagerank,
)


def _links_df(spark, rows):
    return spark.createDataFrame(rows, ["url", "html"])


def test_extract_links_resolution_and_anchors(spark):
    html = (b'<html><body>'
            b'<a href="/a/b">Root Rel</a> '
            b'<a href="c.html">Bare Rel</a> '
            b'<a href="https://other.com/x">Abs</a> '
            b'<a href="/q?u=1" class="x">Attrs</a>'
            b'</body></html>')
    out = {(r["dst_url"], r["anchor_text"]) for r in
           extract_links(_links_df(
               spark, [("https://ex.com/page", html)])).collect()}
    assert out == {
        ("https://ex.com/a/b", "Root Rel"),
        ("https://ex.com/c.html", "Bare Rel"),
        ("https://other.com/x", "Abs"),
        ("https://ex.com/q?u=1", "Attrs"),
    }


def test_extract_links_skips_non_html_payloads(spark):
    rows = [
        ("https://ex.com/pdf", b"%PDF-1.7 not html"),
        ("https://ex.com/poison", b"\x00\xff\xfe<not html"),
        ("https://ex.com/empty", b""),
        ("https://ex.com/ok", b'<html><a href="/x">X</a></html>'),
    ]
    out = extract_links(_links_df(spark, rows)).collect()
    assert [(r["src_url"], r["dst_url"]) for r in out] == [
        ("https://ex.com/ok", "https://ex.com/x")]


def test_page_html_gate_never_decodes_poison(spark):
    """The CASE gate must keep Spark's throwing UTF-8 decode away from
    malformed bytes even when every row is projected."""
    rows = [("a", b"\x00\xff\xfe<not html"), ("b", b"<html>ok</html>")]
    df = spark.createDataFrame(rows, ["id", "html"])
    got = {r["id"]: r["p"] for r in
           df.select("id", page_html(F.col("html")).alias("p")).collect()}
    assert got == {"a": "", "b": "<html>ok</html>"}


def test_host_graph_counts(spark):
    html = (b'<html><a href="/x">X</a> <a href="/y">Y</a> '
            b'<a href="https://b.com/z">Z</a></html>')
    edges = extract_links(_links_df(spark, [
        ("https://a.com/p1", html), ("https://a.com/p2", html)]))
    g = {(r["src_site"], r["dst_site"]): r["n_links"]
         for r in host_graph(edges).collect()}
    assert g == {("https://a.com", "https://a.com"): 4,
                 ("https://a.com", "https://b.com"): 2}


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------


def _pr(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst", "weight"])
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_pagerank_symmetric_two_cycle(spark):
    """a<->b with equal weights is the stationary distribution from the
    start: every iteration returns exactly 1/2 per node."""
    ranks = _pr(spark, [("a", "b", 1), ("b", "a", 1)], iters=4)
    assert ranks == {"a": 0.5, "b": 0.5}


def test_pagerank_one_iteration_by_hand(spark):
    """Star a->b, a->c (equal weight), nothing points at a.

    After 1 iteration with d=0.85, N=3:
      rank(a) = 0.15/3                      (no in-links)
      rank(b) = rank(c) = 0.15/3 + 0.85 * (1/3 * 1/2)
    """
    ranks = _pr(spark, [("a", "b", 1), ("a", "c", 1)], iters=1)
    base = (1.0 - 0.85) / 3
    assert ranks["a"] == pytest.approx(base, abs=1e-15)
    expected = base + 0.85 * ((1.0 / 3) * 0.5)
    assert ranks["b"] == pytest.approx(expected, abs=1e-15)
    assert ranks["c"] == ranks["b"]


def test_pagerank_weights_split_contribution(spark):
    """a->b weight 3, a->c weight 1: b receives 3/4 of a's damped mass."""
    ranks = _pr(spark, [("a", "b", 3), ("a", "c", 1)], iters=1)
    base = (1.0 - 0.85) / 3
    assert ranks["b"] == pytest.approx(base + 0.85 * (1.0 / 3) * 0.75,
                                       abs=1e-15)
    assert ranks["c"] == pytest.approx(base + 0.85 * (1.0 / 3) * 0.25,
                                       abs=1e-15)


def test_pagerank_mass_conservation_no_dangling(spark):
    """With every node having out-edges, total rank stays 1 each
    iteration (up to float addition)."""
    edges = [("a", "b", 1), ("b", "c", 2), ("c", "a", 1), ("c", "b", 1)]
    for iters in (1, 3):
        ranks = _pr(spark, edges, iters=iters)
        assert math.fsum(ranks.values()) == pytest.approx(1.0, abs=1e-12)


def test_pagerank_partitioning_invariant_bit_exact(spark):
    """Same graph, different physical layout -> identical rank BITS
    (the ordered-fold determinism the oracle twin relies on)."""
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 11}", (i % 3) + 1)
             for i in range(40)]
    df1 = spark.createDataFrame(edges, ["src", "dst", "weight"])
    df2 = df1.repartition(13, "dst")
    r1 = {r["node"]: r["rank"] for r in pagerank(df1, iters=3).collect()}
    r2 = {r["node"]: r["rank"] for r in
          pagerank(df2, iters=3, broadcast_ranks=False).collect()}
    assert r1 == r2  # exact float equality, not approx


def test_pagerank_checkpoint_every_matches(spark):
    edges = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)]
    df = spark.createDataFrame(edges, ["src", "dst", "weight"])
    plain = {r["node"]: r["rank"] for r in pagerank(df, iters=4).collect()}
    ck = {r["node"]: r["rank"] for r in
          pagerank(df, iters=4, checkpoint_every=2).collect()}
    assert plain == ck


def test_anchor_text_profile_topk_and_determinism(spark):
    from ocr_automation_system_spark.functions.links import (
        anchor_text_profile,
    )

    rows = []
    # 5x "Widgets", 3x "Home", 2x "About", 1x "" (dropped) -> same dst site
    for i, (t, n) in enumerate([("Widgets", 5), ("Home", 3),
                                ("About", 2), ("", 1)]):
        rows += [(f"https://s{i}{j}.com/p", "https://t.com/x", t)
                 for j in range(n)]
    rows.append(("https://z.com/p", "https://other.com/y", "Solo"))
    df = spark.createDataFrame(rows, ["src_url", "dst_url", "anchor_text"])
    got = {(r["dst_site"], r["rank"]): (r["anchor_text"], r["n_links"])
           for r in anchor_text_profile(df, k=2).collect()}
    assert got[("https://t.com", 1)] == ("Widgets", 5)
    assert got[("https://t.com", 2)] == ("Home", 3)
    assert got[("https://other.com", 1)] == ("Solo", 1)
    assert len(got) == 3  # k=2 cap + empty text dropped

    base = sorted(map(tuple, anchor_text_profile(df, k=2).collect()))
    rep = sorted(map(tuple,
                     anchor_text_profile(df.repartition(7), k=2).collect()))
    assert rep == base


def test_anchor_text_profile_plan_pushes_window_group_limit(spark):
    from ocr_automation_system_spark.functions.links import (
        anchor_text_profile,
    )

    df = spark.createDataFrame(
        [("https://a.com/p", "https://t.com/x", "T")],
        ["src_url", "dst_url", "anchor_text"])
    plan = (anchor_text_profile(df, k=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "WindowGroupLimit" in plan


def test_page_metadata_profiles_and_poison(spark):
    from ocr_automation_system_spark.functions.links import page_metadata

    html = (b"<html><head><title>My Page</title><script>var t=1;"
            b"</script></head><body><a href=\"/x\">x</a>"
            b'<article class="main-content">\nbody\n</article>'
            b"</body></html>")
    rows = [("https://a.com/1", html),
            ("https://a.com/2", b"%PDF-1.4 not html"),
            ("https://a.com/3", b"\x00\xff\xfe poison bytes")]
    out = {r["url"]: r for r in page_metadata(
        spark.createDataFrame(rows, "url string, html binary")).collect()}
    p = out["https://a.com/1"]
    assert (p["title"], p["title_len"], p["n_links"], p["n_scripts"],
            p["has_main_content"]) == ("My Page", 7, 1, 1, True)
    for u in ("https://a.com/2", "https://a.com/3"):  # poison contract
        q = out[u]
        assert (q["title"], q["n_links"], q["has_main_content"]) == \
            ("", 0, False)
    plan = (page_metadata(spark.createDataFrame(
        rows, "url string, html binary"))
        ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Python" not in plan


def test_page_html_sniffs_real_capture_shapes(spark):
    """Crawl captures arrive as '<!DOCTYPE html>', '<HTML>', with leading
    whitespace or a UTF-8 BOM — the sniff must accept all of them (and
    still reject junk/PDF/binary payloads) BYTE-FOR-BYTE identically in
    Spark and in the DuckDB oracle twin."""
    import duckdb

    from ocr_automation_system_spark.functions.links import page_html
    from ocr_automation_system_spark.pipeline_sql import _SQL_HTML_SNIFF

    payloads = [b"<html><body>x</body></html>",
                b"<!DOCTYPE html><HTML>hi</HTML>",
                b"  \r\n<html>y</html>",
                b"\xef\xbb\xbf<HTML>z</HTML>",
                b"<HTML>upper</HTML>",
                b"<!doctype  \n html><html>",
                b"%PDF-1.4 junk",
                b"plain text",
                b""]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(payloads)],
                               "i int, html binary")
    got = {r["i"]: r["page"] != ""
           for r in df.select("i", page_html(F.col("html")).alias("page"))
           .collect()}
    want = {0: True, 1: True, 2: True, 3: True, 4: True, 5: True,
            6: False, 7: False, 8: False}
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, html BLOB)")
    for i, p in enumerate(payloads):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, p])
    oracle = dict(con.execute(
        f"SELECT i, {_SQL_HTML_SNIFF} FROM t ORDER BY i").fetchall())
    assert oracle == want


def test_trustrank_decays_with_distance_from_seeds(spark):
    """Seed-personalized teleport: a chain seed -> a -> b -> spam gives
    strictly decreasing trust along the chain, and an unreachable spam
    clique gets exactly zero (unlike classic PageRank, which gives every
    node the (1-d)/N floor)."""
    from pyspark.sql import functions as F

    from ocr_automation_system_spark.functions.links import pagerank

    edges = [("seed", "a", 1), ("a", "b", 1), ("b", "spam1", 1),
             ("spam1", "spam2", 1), ("spam2", "spam1", 1),
             ("isolated1", "isolated2", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, weight int")
    tr = {r["node"]: r["rank"]
          for r in pagerank(df, iters=4, seeds=["seed"]).collect()}
    assert tr["seed"] > tr["a"] > tr["b"] > 0
    assert tr["isolated1"] == 0.0 and tr["isolated2"] == 0.0
    pr = {r["node"]: r["rank"] for r in pagerank(df, iters=4).collect()}
    assert pr["isolated2"] > 0.0  # classic floor, for contrast
    # empty seed list is a misconfiguration, not an empty teleport
    import pytest
    with pytest.raises(ValueError):
        pagerank(df, seeds=[])


def _hits(spark, edges, **kw):
    from ocr_automation_system_spark.functions.links import hits

    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: (r["authority"], r["hub"])
            for r in hits(df, **kw).collect()}


def test_hits_path_counts_by_hand(spark):
    """a->c, b->c, c->d. Unnormalized integer path counts:

    k=1: auth(c)=hub(a)+hub(b)=2, auth(d)=hub(c)=1;
         hub(a)=hub(b)=auth(c)=2, hub(c)=auth(d)=1.
    k=2: auth(c)=hub(a)+hub(b)=4, auth(d)=hub(c)=1;
         hub(a)=hub(b)=4, hub(c)=1.
    L1-normalized: authority c=4/5, d=1/5; hub a=b=4/9, c=1/9.
    """
    got = _hits(spark, [("a", "c"), ("b", "c"), ("c", "d")], iters=2)
    assert got["c"] == (4 / 5, 1 / 9)
    assert got["d"] == (1 / 5, 0.0)
    assert got["a"] == (0.0, 4 / 9) and got["b"] == (0.0, 4 / 9)


def test_hits_one_iteration_and_duplicate_edges_collapse(spark):
    """iters=1 on the same graph, with a duplicated edge (the page->host
    rollup produces multiplicities; HITS runs on the simple graph)."""
    got = _hits(spark, [("a", "c"), ("a", "c"), ("b", "c"), ("c", "d")],
                iters=1)
    assert got["c"] == (2 / 3, 1 / 5)
    assert got["d"] == (1 / 3, 0.0)
    assert got["a"] == (0.0, 2 / 5)


def test_hits_partitioning_invariant_bit_exact(spark):
    """Integer path counts make the scores partition-invariant without
    any ordered folds — repartition(1) vs (7) must be bitwise equal."""
    from ocr_automation_system_spark.functions.links import hits

    edges = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(60)]
    df = spark.createDataFrame(edges, "src string, dst string")
    one = sorted(hits(df.repartition(1), iters=3).collect())
    seven = sorted(hits(df.repartition(7), iters=3).collect())
    assert one == seven


def test_pagerank_join_path_matches_broadcast_path(spark):
    """The web-scale configuration — broadcast_ranks=False (rank table
    too big to broadcast at 10^9+ nodes) with per-iteration local
    checkpoints — must produce BIT-IDENTICAL ranks to the broadcast
    path the DuckDB twin certifies: the sorted-fold determinism is the
    guarantee, the join strategy is free to differ. The plan check
    pins that the rank-vector join really does avoid a broadcast."""
    from ocr_automation_system_spark.functions.links import pagerank

    edges = [(f"h{i}", f"h{(i * 7 + j) % 40}", 1 + (i + j) % 3)
             for i in range(40) for j in range(2)]
    df = spark.createDataFrame(edges, ["src", "dst", "weight"])
    a = {r["node"]: r["rank"]
         for r in pagerank(df, iters=3, broadcast_ranks=True).collect()}
    b_df = pagerank(df, iters=3, broadcast_ranks=False,
                    checkpoint_every=1)
    b = {r["node"]: r["rank"] for r in b_df.collect()}
    assert a == b  # bit-identical doubles, not approx

    seeded_a = {r["node"]: r["rank"] for r in pagerank(
        df, iters=3, seeds=["h0", "h1"], broadcast_ranks=True).collect()}
    seeded_b = {r["node"]: r["rank"] for r in pagerank(
        df, iters=3, seeds=["h0", "h1"],
        broadcast_ranks=False).collect()}
    assert seeded_a == seeded_b


def test_host_reciprocity_hand_graph(spark, tmp_path, monkeypatch):
    """X95 semantics on a hand graph via the library pieces: a <-> b
    reciprocated, a -> c one-way, self-loops dropped."""
    from pyspark.sql import functions as F

    edges = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "c"), ("a", "b")]
    e = (spark.createDataFrame(edges, ["src", "dst"])
         .filter(F.col("src") != F.col("dst")).distinct())
    out = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_edges"))
    rev = e.select(F.col("dst").alias("_s"), F.col("src").alias("_d"))
    rec = (e.join(rev, (e["src"] == F.col("_s"))
                  & (e["dst"] == F.col("_d")), "left_semi")
           .groupBy("src").agg(F.count(F.lit(1)).alias("rec")))
    got = {r["src"]: (r["out_edges"],)
           for r in out.collect()}
    rc = {r["src"]: r["rec"] for r in rec.collect()}
    assert got["a"] == (2,) and rc.get("a", 0) == 1   # a->b reciprocated
    assert got["b"] == (1,) and rc.get("b", 0) == 1
    assert got["c"] == (0,) if "c" in got else "c" not in got  # loop gone


def test_seed_distance_hand_graph(spark):
    """X97: chain s -> a -> b -> c -> d with seed {s}: dists 0,1,2,3
    and d beyond max_hops=3 reads -1; disconnected island reads -1."""
    from ocr_automation_system_spark.functions.links import seed_distance

    edges = [("s", "a"), ("a", "b"), ("b", "c"), ("c", "d"),
             ("x", "y")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["host"]: r["dist"]
           for r in seed_distance(df, ["s"], max_hops=3).collect()}
    assert got == {"s": 0, "a": 1, "b": 2, "c": 3, "d": -1,
                   "x": -1, "y": -1}


def _exact_hll_registers(items):
    """Exact (j, r) register map of a set of node ids, the HLL contract
    replayed in pure Python: j = first md5 byte, r = 1 + leading zero
    bits of the next 60 bits (61 if zero)."""
    import hashlib

    regs = {}
    for it in items:
        h = hashlib.md5(it.encode()).hexdigest()
        j = int(h[:2], 16)
        tail = h[2:17].lstrip("0")
        if not tail:
            r = 61
        else:
            lz = {"8": 0, "9": 0, "a": 0, "b": 0, "c": 0, "d": 0,
                  "e": 0, "f": 0, "4": 1, "5": 1, "6": 1, "7": 1,
                  "2": 2, "3": 2, "1": 3}[tail[0]]
            r = 4 * (15 - len(tail)) + lz + 1
        regs[j] = max(regs.get(j, 0), r)
    return regs


def _exact_ball_estimate(items):
    """Raw Flajolet estimate the hyperball contract pins, replayed over
    the exact ball membership."""
    regs = _exact_hll_registers(items)
    s = 0.0
    for j in sorted(regs):
        s += 2.0 ** -regs[j]
    alpha_m2 = 0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0
    return alpha_m2 / (s + (256 - len(regs)))


def test_hyperball_matches_exact_balls_on_hand_graph(spark):
    """On a graph small enough for exact BFS, every (host, t) estimate
    must equal the raw HLL estimate of the TRUE ball membership — the
    register-merge rounds lose nothing vs materializing the balls."""
    from ocr_automation_system_spark.functions.links import hyperball

    edges = [("a", "b"), ("b", "c"), ("c", "d"),  # 3-chain
             ("e", "f"), ("f", "e")]              # 2-cycle, disconnected
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {(r["host"], r["t"]): (r["n_registers"], r["est_raw"])
           for r in hyperball(e, max_t=3).collect()}

    nodes = sorted({n for ed in edges for n in ed})
    assert set(got) == {(n, t) for n in nodes for t in range(4)}
    for n in nodes:
        ball = {n}
        for t in range(4):
            n_regs, est = got[(n, t)]
            assert n_regs == len(_exact_hll_registers(ball))
            assert est == pytest.approx(_exact_ball_estimate(ball),
                                        abs=0.0)
            ball = ball | {w for v in ball for w in adj.get(v, ())}
    # estimates are monotone in t (registers only grow)
    for n in nodes:
        for t in range(3):
            assert got[(n, t + 1)][1] >= got[(n, t)][1]


def test_harmonic_from_hyperball_telescopes(spark):
    """harmonic = sum of (N(t) - N(t-1)) / t over the returned shells;
    a sink node (constant ball) gets exactly 0.0."""
    from ocr_automation_system_spark.functions.links import (
        harmonic_from_hyperball, hyperball,
    )

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f"), ("f", "e")]
    e = spark.createDataFrame(edges, ["src", "dst"])
    balls = hyperball(e, max_t=3)
    est = {(r["host"], r["t"]): r["est_raw"] for r in balls.collect()}
    got = {r["host"]: (r["max_t"], r["harmonic"])
           for r in harmonic_from_hyperball(balls).collect()}
    for host in {h for h, _ in est}:
        want = sum((est[(host, t)] - est[(host, t - 1)]) / t
                   for t in range(1, 4))
        assert got[host][0] == 3
        assert got[host][1] == pytest.approx(want, rel=1e-12)
    assert got["d"][1] == 0.0  # sink: ball never grows


def _lpa_sim(edges, iters):
    """Pure-Python replay of the synchronous LPA contract."""
    und = set()
    for s, d in edges:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    nodes = sorted({n for e in und for n in e})
    nbrs = {n: sorted(d for s, d in und if s == n) for n in nodes}
    lab = {n: n for n in nodes}
    for _ in range(iters):
        nxt = {}
        for n in nodes:
            if not nbrs[n]:
                nxt[n] = lab[n]
                continue
            cnt = {}
            for m in nbrs[n]:
                cnt[lab[m]] = cnt.get(lab[m], 0) + 1
            mx = max(cnt.values())
            nxt[n] = min(l for l, c in cnt.items() if c == mx)
        lab = nxt
    return lab


def test_label_propagation_matches_python_sim(spark):
    """Two triangles joined by one bridge: each triangle must collapse
    to a single community and the bridge must NOT merge them; every
    label equals the synchronous-LPA Python replay."""
    from ocr_automation_system_spark.functions.links import (
        label_propagation,
    )

    edges = [("a", "b"), ("b", "c"), ("c", "a"),        # triangle 1
             ("x", "y"), ("y", "z"), ("z", "x"),        # triangle 2
             ("c", "x"),                                 # bridge
             ("p", "q")]                                 # pendant pair
    for iters in (1, 3):
        got = {r["host"]: r["community"] for r in
               label_propagation(
                   spark.createDataFrame(edges, ["src", "dst"]),
                   iters=iters).collect()}
        assert got == _lpa_sim(edges, iters)
    final = _lpa_sim(edges, 3)
    t1 = {final[n] for n in "abc"}
    t2 = {final[n] for n in "xyz"}
    assert len(t1) == 1 and len(t2) == 1 and t1 != t2
    # the pendant pair exhibits the documented synchronous-LPA
    # oscillation: labels SWAP each round, so after an odd round count
    # each holds the other's id — pinned, not papered over
    assert (final["p"], final["q"]) == ("q", "p")


def test_community_modularity_by_hand(spark):
    """Two triangles + bridge + pendant pair, LPA(3) labels: each
    triangle is one community with term 3/8 - (7/16)^2; each pendant
    node is a singleton with term -(1/16)^2. All dyadic rationals —
    compared exactly, and Q = 0.359375 signals real structure."""
    from ocr_automation_system_spark.functions.links import (
        community_modularity, label_propagation,
    )

    edges = [("a", "b"), ("b", "c"), ("c", "a"),
             ("x", "y"), ("y", "z"), ("z", "x"),
             ("c", "x"), ("p", "q")]
    e = spark.createDataFrame(edges, ["src", "dst"])
    labels = label_propagation(e, iters=3)
    rows = {tuple(sorted(r["community"])): r
            for r in community_modularity(e, labels).collect()}
    # two triangle communities (label = min id of each triangle)
    tri = [r for r in rows.values() if r["n_nodes"] == 3]
    singles = [r for r in rows.values() if r["n_nodes"] == 1]
    assert len(tri) == 2 and len(singles) == 2
    for r in tri:
        assert r["internal_edges"] == 3
        assert r["degree_sum"] == 7
        assert r["modularity_term"] == 3 / 8 - (7 / 16) ** 2
    for r in singles:
        assert r["internal_edges"] == 0
        assert r["degree_sum"] == 1
        assert r["modularity_term"] == -((1 / 16) ** 2)
    q = sum(r["modularity_term"] for r in rows.values())
    assert q == 0.359375


def test_label_propagation_plan_has_no_window(spark):
    """Every LPA round is aggregate-only: a hub's neighbor-label census
    must combine map-side, never buffer in a window task."""
    from ocr_automation_system_spark.functions.links import (
        label_propagation,
    )

    e = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    plan = (label_propagation(e, iters=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan


def test_hyperball_plan_has_no_window(spark):
    from ocr_automation_system_spark.functions.links import hyperball

    e = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    plan = (hyperball(e, max_t=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan


def test_page_directives_extraction_and_poison(spark):
    from ocr_automation_system_spark.functions.links import page_directives

    html = (b'<html><head><title>T</title><meta charset="UTF-8">'
            b'<meta name="ROBOTS" content="NOINDEX,nofollow">'
            b'<link rel="canonical" href="https://c.org/master">'
            b'<script type="application/ld+json">'
            b'{"@context":"https://schema.org","@type":"Article"}</script>'
            b'<script type="application/ld+json">{"@type":"Product"}'
            b'</script></head><body>x</body></html>')
    bare = b"<html><head></head><body>plain</body></html>"
    rows = [("https://a.com/1", html),
            ("https://a.com/2", bare),
            ("https://a.com/3", b"\x00\xff\xfe poison")]
    out = {r["url"]: r for r in page_directives(
        spark.createDataFrame(rows, "url string, html binary")).collect()}
    p = out["https://a.com/1"]
    assert (p["robots"], p["noindex"], p["nofollow"]) == \
        ("noindex,nofollow", True, True)
    assert p["meta_charset"] == "utf-8"
    assert p["canonical_url"] == "https://c.org/master"
    assert (p["n_jsonld"], p["jsonld_type"]) == (2, "Article")
    for u in ("https://a.com/2", "https://a.com/3"):
        q = out[u]
        assert (q["robots"], q["noindex"], q["canonical_url"],
                q["n_jsonld"], q["jsonld_type"]) == ("", False, "", 0, "")
    plan = (page_directives(spark.createDataFrame(
        rows, "url string, html binary"))
        ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Python" not in plan


def test_canonical_dup_groups_collapse(spark):
    from ocr_automation_system_spark.functions.links import (
        canonical_dup_groups,
    )

    def page(canon):
        return (f'<html><head><link rel="canonical" href="{canon}">'
                f"</head><body>x</body></html>").encode()

    rows = [
        ("https://a.com/1", page("https://c.org/m")),
        ("https://b.com/2", page("https://c.org/m")),
        ("https://a.com/3", page("https://c.org/m")),
        ("https://a.com/4", page("https://c.org/solo")),   # group of 1
        ("https://a.com/5", b"<html><head></head><body>n</body></html>"),
    ]
    out = canonical_dup_groups(
        spark.createDataFrame(rows, "url string, html binary")).collect()
    assert len(out) == 1
    g = out[0]
    assert (g["canonical_url"], g["n_pages"], g["n_hosts"],
            g["keep_url"]) == ("https://c.org/m", 3, 2, "https://a.com/1")


def test_corpus_carries_directives(spark, tmp_path):
    """The synthetic corpus embeds the directive shapes at real-crawl
    rates — nonzero noindex, canonical and JSON-LD populations, and at
    least one canonical group of >= 2 (entity-keyed targets)."""
    from ocr_automation_system_spark.corpus import write_corpus
    from ocr_automation_system_spark.functions.links import (
        canonical_dup_groups, page_directives,
    )

    p = write_corpus(str(tmp_path / "c.parquet"), n_rows=300, seed=11)
    docs = spark.read.parquet(p)
    d = page_directives(docs)
    agg = d.agg(
        F.sum(F.col("noindex").cast("long")).alias("ni"),
        F.sum((F.col("canonical_url") != "").cast("long")).alias("ca"),
        F.sum("n_jsonld").alias("jl"),
        F.sum((F.col("meta_charset") != "").cast("long")).alias("cs"),
    ).collect()[0]
    assert agg["ni"] > 0 and agg["ca"] > 0 and agg["jl"] > 0
    assert agg["cs"] > 0
    assert canonical_dup_groups(docs).count() >= 1


def test_robots_verdicts_rfc9309_semantics(spark):
    """REP matching laws: longest matching prefix wins; equal-length
    Allow beats Disallow (least restrictive); no matching rule (or no
    rules for the host at all) -> allow; the empty prefix matches every
    path."""
    from ocr_automation_system_spark.functions.links import (
        robots_verdicts,
    )

    urls = spark.createDataFrame(
        [("https://a.com/private/doc1",),     # /private disallowed
         ("https://a.com/private/ok/x",),     # carve-back allow wins
         ("https://a.com/public/p",),         # only '' matches
         ("https://a.com/tie/t",),            # equal-length tie -> allow
         ("https://b.com/anything",)],        # no rules for host
        "url string")
    rules = spark.createDataFrame(
        [("a.com", "", True),
         ("a.com", "/private", False),
         ("a.com", "/private/ok", True),
         ("a.com", "/tie", False),
         ("a.com", "/tie", True)],
        "host string, prefix string, allow boolean")
    got = {r["url"]: (r["allow"], r["matched_prefix"])
           for r in robots_verdicts(urls, rules).collect()}
    assert got["https://a.com/private/doc1"] == (False, "/private")
    assert got["https://a.com/private/ok/x"] == (True, "/private/ok")
    assert got["https://a.com/public/p"] == (True, "")
    assert got["https://a.com/tie/t"] == (True, "/tie")
    assert got["https://b.com/anything"] == (True, "")


def test_robots_verdicts_rfc9309_wildcards(spark):
    """RFC 9309 special characters: ``*`` matches any char sequence,
    a TRAILING ``$`` anchors at the path end; regex metacharacters in
    rule text stay literal; specificity counts the rule text length
    (wildcards as written), so a longer wildcard Allow beats a shorter
    wildcard Disallow."""
    from ocr_automation_system_spark.functions.links import (
        robots_verdicts,
    )

    urls = spark.createDataFrame(
        [("https://a.com/pan/0000027",),   # *7$ disallow fires
         ("https://a.com/pan/0000017",),   # longer *17$ allow wins
         ("https://a.com/pan/0000170",),   # $ anchor: no match -> allow
         ("https://a.com/a.b/z",),         # literal dot matches
         ("https://a.com/aXb/z",),         # dot NOT treated as regex
         ("https://a.com/mid/x/end",),     # mid-path * spans segments
         ("https://a.com/mid/end",)],      # * matches empty too? no: /x/
        "url string")
    rules = spark.createDataFrame(
        [("a.com", "/pan/*7$", False),
         ("a.com", "/pan/*17$", True),
         ("a.com", "/a.b/", False),
         ("a.com", "/mid/*/end", False)],
        "host string, prefix string, allow boolean")
    got = {r["url"]: (r["allow"], r["matched_prefix"])
           for r in robots_verdicts(urls, rules).collect()}
    assert got["https://a.com/pan/0000027"] == (False, "/pan/*7$")
    assert got["https://a.com/pan/0000017"] == (True, "/pan/*17$")
    assert got["https://a.com/pan/0000170"] == (True, "")
    assert got["https://a.com/a.b/z"] == (False, "/a.b/")
    assert got["https://a.com/aXb/z"] == (True, "")
    assert got["https://a.com/mid/x/end"] == (False, "/mid/*/end")
    assert got["https://a.com/mid/end"] == (True, "")


def test_redirect_resolved_one_hop(spark):
    """Stubs resolve against the corpus: captured non-stub target,
    captured stub target (chain), uncaptured target; non-stub pages
    emit no row."""
    from ocr_automation_system_spark.functions.links import (
        redirect_resolved,
    )

    stub = (lambda tgt: (
        '<html><head><meta http-equiv="refresh" '
        f'content="0;url={tgt}"></head><body>moving</body>'
        '</html>').encode())
    rows = [("https://r.com/s1", stub("https://r.com/final")),
            ("https://r.com/s2", stub("https://r.com/s1")),   # chain
            ("https://r.com/s3", stub("https://r.com/gone")),  # no capture
            ("https://r.com/final", b"<html><body>content</body></html>")]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = {r["url"]: (r["target"], r["target_captured"],
                      r["target_is_redirect"])
           for r in redirect_resolved(df).collect()}
    assert out == {
        "https://r.com/s1": ("https://r.com/final", True, False),
        "https://r.com/s2": ("https://r.com/s1", True, True),
        "https://r.com/s3": ("https://r.com/gone", False, False),
    }
    # re-applying on the chain's resolved target closes it: s2 -> s1
    # is a stub, and s1's own row says where it goes next
    assert out["https://r.com/s2"][2] and not out["https://r.com/s1"][2]


def test_soft404_flags_planted(spark):
    """Planted error/parked/normal/non-html payloads get the right
    verdicts; error outranks parked when both phrasings appear."""
    from ocr_automation_system_spark.functions.links import (
        soft404_flags,
    )

    rows = [
        ("u1", b"<html><head><title>404 Not Found</title></head>"
               b"<body>The page you requested could not be found."
               b"</body></html>"),
        ("u2", b"<html><body>This domain is for sale. Buy this domain "
               b"today.</body></html>"),
        ("u3", b"<html><head><title>Error 404</title></head><body>"
               b"Site under construction.</body></html>"),  # both
        ("u4", b"<html><body>Quarterly results and market news."
               b"</body></html>"),
        ("u5", b"\x00\xff\xfenot html"),
        ("u6", b"\xef\xbb\xbf<html><body>Page does not exist."
               b"</body></html>"),  # BOM'd error page still decodes
    ]
    got = {r["url"]: (r["error_hit"], r["parked_hit"], r["reason"])
           for r in soft404_flags(
               spark.createDataFrame(rows, "url string, html binary")
           ).collect()}
    assert got["u1"] == (True, False, "error_page")
    assert got["u2"] == (False, True, "parked")
    assert got["u3"] == (True, True, "error_page")  # error outranks
    assert got["u4"] == (False, False, "ok")
    assert got["u5"] == (False, False, "ok")        # poison contract
    assert got["u6"] == (True, False, "error_page")


def test_host_error_rate_census(spark):
    from ocr_automation_system_spark.functions.links import (
        host_error_rate,
    )

    rows = [
        ("https://bad.com/a", b"<html><body>404 not found</body></html>"),
        ("https://bad.com/b", b"<html><body>coming soon</body></html>"),
        ("https://bad.com/c", b"<html><body>fine content here</body></html>"),
        ("https://ok.com/a", b"<html><body>fine content here</body></html>"),
    ]
    got = {r["host"]: r for r in host_error_rate(
        spark.createDataFrame(rows, "url string, html binary")).collect()}
    b = got["bad.com"]
    assert (b["n_pages"], b["n_error"], b["n_parked"]) == (3, 1, 1)
    assert b["error_rate"] == 2 / 3
    o = got["ok.com"]
    assert (o["n_pages"], o["n_error"], o["n_parked"]) == (1, 0, 0)
    assert o["error_rate"] == 0.0


def test_charset_census_classes(spark):
    """BOM outranks the meta label; legacy labels surface; non-html
    and undeclared pages fall into their own classes."""
    from ocr_automation_system_spark.functions.links import (
        charset_census,
    )

    rows = [
        ("https://a.com/1", b'<html><head><meta charset="UTF-8"></head>'
                            b"<body>x</body></html>"),
        ("https://a.com/2", b'<html><head><meta charset="iso-8859-1">'
                            b"</head><body>x</body></html>"),
        ("https://b.com/3", b'\xef\xbb\xbf<html><head><meta charset='
                            b'"utf-8"></head><body>x</body></html>'),
        ("https://b.com/4", b"<html><body>x</body></html>"),
        ("https://b.com/5", b"%PDF-1.4 not a page"),
    ]
    got = {r["charset"]: (r["n_pages"], r["n_hosts"])
           for r in charset_census(
               spark.createDataFrame(rows, "url string, html binary")
           ).collect()}
    assert got == {"utf-8": (1, 1), "iso-8859-1": (1, 1),
                   "bom-utf8": (1, 1), "undeclared": (1, 1),
                   "not-html": (1, 1)}


def test_corpus_carries_soft404_and_bom_shapes(spark):
    """The deterministic corpus plants both tiers the census queries
    need: soft-404/parked pages and BOM'd captures."""
    from ocr_automation_system_spark.functions.links import (
        charset_census, soft404_flags,
    )
    from ocr_automation_system_spark.queries import corpus_for

    c = corpus_for(spark, "/root/testdata/sf0.001").select("url", "html")
    flags = soft404_flags(c)
    n_err = flags.filter(F.col("reason") != "ok").count()
    assert n_err > 0
    # every planted soft404 row is caught (url kind is the plant label)
    planted = c.filter(F.col("url").contains("/soft404/")).count()
    caught = (flags.join(c, "url")
              .filter(F.col("url").contains("/soft404/"))
              .filter(F.col("reason") != "ok").count())
    assert planted == caught > 0
    cs = {r["charset"] for r in charset_census(c).collect()}
    assert "bom-utf8" in cs and "iso-8859-1" in cs and "utf-8" in cs


def test_meta_refresh_targets_planted(spark):
    from ocr_automation_system_spark.functions.links import (
        meta_refresh_targets,
    )

    rows = [
        ("u1", b'<html><head><meta http-equiv="refresh" '
               b'content="0;url=https://a.com/new"></head>'
               b"<body>Redirecting</body></html>"),
        ("u2", b'<html><head><meta http-equiv="refresh" '
               b'content="3; url=https://a.com/slow"></head>'
               b"<body>x</body></html>"),
        ("u3", b"<html><body>no directive here</body></html>"),
        ("u4", b"\x00binary junk"),
    ]
    got = {r["url"]: (r["refresh_delay"], r["refresh_target"],
                      r["is_redirect"])
           for r in meta_refresh_targets(
               spark.createDataFrame(rows, "url string, html binary")
           ).collect()}
    assert got["u1"] == (0, "https://a.com/new", True)
    assert got["u2"] == (3, "https://a.com/slow", True)
    assert got["u3"] == (-1, "", False)
    assert got["u4"] == (-1, "", False)


def test_corpus_carries_redirect_stubs(spark):
    from ocr_automation_system_spark.functions.links import (
        meta_refresh_targets,
    )
    from ocr_automation_system_spark.queries import corpus_for

    c = corpus_for(spark, "/root/testdata/sf0.001").select("url", "html")
    r = meta_refresh_targets(c).filter(F.col("is_redirect"))
    planted = c.filter(F.col("url").contains("/redirect/")).count()
    assert r.count() == planted > 0
    # every target is same-host (the synthetic contract)
    bad = r.filter(
        F.regexp_extract("url", r"https?://([^/]+)", 1)
        != F.regexp_extract("refresh_target", r"https?://([^/]+)", 1)
    ).count()
    assert bad == 0
