"""X157 mixture waterfilling: solver invariants (conservation,
saturation cascade, proportionality), and the unrolled-CTE SQL twin
pinned bit-equal to the python solver on censuses that DO saturate
(the driver corpus is near-uniform, so its contract row never
exercises the redistribution rounds — these fixtures must)."""

import duckdb

from ocr_automation_system_spark.functions.curation import mixture_waterfill
from ocr_automation_system_spark.queries import SQL_MIXTURE_WATERFILL


def test_surplus_redistribution():
    c = [("a", 10, 1), ("b", 1000, 1), ("c", 1000, 1)]
    out = {s: (al, sat) for s, _, _, al, sat in mixture_waterfill(c, 100)}
    assert out["a"] == (10, True)          # capped at availability
    assert out["b"] == (45, False)         # (100-10)//2 each
    assert out["c"] == (45, False)
    assert sum(a for a, _ in out.values()) == 100


def test_budget_exceeds_supply_saturates_all():
    c = [("a", 10, 1), ("b", 20, 3)]
    out = mixture_waterfill(c, 10**9)
    assert all(sat for *_, sat in out)
    assert [al for *_, al, _ in [(s, a, w, al, sat)
            for s, a, w, al, sat in out]] == [10, 20]


def test_zero_budget_and_conservation():
    c = [("a", 10, 1), ("b", 1000, 2), ("c", 500, 3)]
    assert all(al == 0 for *_, al, _ in mixture_waterfill(c, 0))
    for budget in (1, 7, 100, 1510, 10000):
        out = mixture_waterfill(c, budget)
        total = sum(al for *_, al, _ in out)
        # never over-assigns; floor loss bounded by n_sources-1 per round
        assert total <= budget or total == sum(a for _, a, _ in c)
        assert all(al <= a for _, a, _, al, _ in out)


def test_weight_proportionality_unsaturated():
    c = [("a", 10**6, 1), ("b", 10**6, 4)]
    out = {s: al for s, _, _, al, _ in mixture_waterfill(c, 100000)}
    assert out["b"] == 4 * out["a"]


def _twin_rows(census):
    """Run the unrolled-CTE twin over a crafted documents view whose
    BPE token counts and source ids reproduce ``census`` exactly
    (text 'a a a ...' = one token per 'a'; srcN -> weight N%5+1)."""
    con = duckdb.connect()
    rows = []
    for src, avail, _w in census:
        rows.append((src, " ".join(["a"] * avail)))
    con.execute("CREATE TABLE raw (source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO raw VALUES (?, ?)", rows)
    con.execute("CREATE VIEW documents AS SELECT * FROM raw")
    df = con.execute(SQL_MIXTURE_WATERFILL).df()
    return {r["source"]: (int(r["available_tokens"]), int(r["weight"]),
                          int(r["alloc_tokens"]), bool(r["saturated"]))
            for _, r in df.iterrows()}


def test_sql_twin_matches_solver_with_saturation_cascade():
    # weights: src0->1, src1->2, src2->3; src0 tiny so it saturates and
    # its surplus redistributes across a second round
    census = [("src0", 10, 1), ("src1", 50000, 2), ("src2", 100000, 3)]
    budget = (3 * sum(a for _, a, _ in census)) // 10  # twin's 30% rule
    expect = {s: (a, w, al, sat)
              for s, a, w, al, sat in mixture_waterfill(census, budget)}
    got = _twin_rows(census)
    assert got == expect
    assert got["src0"][3] is True          # the cascade actually fired


def test_sql_twin_matches_solver_all_saturated():
    # 30% of total >= every source only if availability is lopsided:
    # one giant source pushes the budget over the small ones' supply
    census = [("src0", 5, 1), ("src1", 7, 2), ("src2", 1000000, 3)]
    budget = (3 * sum(a for _, a, _ in census)) // 10
    expect = {s: (a, w, al, sat)
              for s, a, w, al, sat in mixture_waterfill(census, budget)}
    assert expect == _twin_rows(census)
