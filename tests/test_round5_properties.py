"""Round-5 property suite: the new kernels' laws under randomized
input, not just fixtures — gear CDC boundary shift-invariance and
scalar/numpy agreement, FastCDC clamp laws, confusable-chain
confluence, curriculum-blend key/order equivalence, and the full-PSL
matcher against an independently-written naive implementation of the
published algorithm over hosts assembled from the REAL rule list."""

from __future__ import annotations

import hashlib
import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_automation_system_spark.functions.curation import (
    cdc_boundaries,
    cdc_cuts_clamped,
    gear_table,
)

# text alphabet mixing ASCII, Latin-1, BMP and astral codepoints so the
# utf-32 codepoint path (not UTF-16 units) is what both engines count
_ALPHABET = st.sampled_from(
    list("abcdef XY.z09") + ["é", "ß", "中", "й", "𝄞", "😀"])
_TEXT = st.text(alphabet=_ALPHABET, min_size=0, max_size=200)


def _scalar_boundaries(t: str, w: int = 8, divisor: int = 16) -> list:
    """Independent SCALAR reimplementation of the gear boundary law
    (mirrors the docstring, not the numpy code)."""
    G = gear_table()
    n = len(t)
    out = []
    for e in range(w, n):
        h = sum(G[ord(t[e - 1 - j]) % 256] << j for j in range(w))
        if h % divisor == 0:
            out.append(e)
    return out


@settings(max_examples=200, deadline=None)
@given(_TEXT)
def test_gear_numpy_equals_scalar(t):
    assert cdc_boundaries(t) == _scalar_boundaries(t)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=_ALPHABET, min_size=1, max_size=20), _TEXT)
def test_gear_boundaries_shift_invariant(prefix, t):
    """The CDC property as a theorem over random strings: a boundary
    gram fully inside t keeps or loses boundary-ness independent of
    any prepended prefix — its window content is unchanged, so its
    image position in prefix+t is a boundary iff it was one in t
    (modulo each string's own final-position exclusion)."""
    w, p, n = 8, len(prefix), len(t)
    base = set(cdc_boundaries(t))
    shifted = set(cdc_boundaries(prefix + t))
    # the precise statement: images of interior-of-t windows agree —
    # e in [w, n-1) is a gram fully inside t AND not the excluded
    # final position of either string, so its image e+p is a boundary
    # of prefix+t iff e is a boundary of t
    for e in range(w, n - 1):
        img = e + p
        want = e in base
        # e in [w, n-1) is never the excluded final position of t,
        # and img < p + n is never the excluded final of prefix+t
        assert (img in shifted) == want, (e, img)


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_clamp_law_random_candidates(data):
    """cdc_cuts_clamped over arbitrary candidate sets: cuts strictly
    increase; every gap between consecutive bounds (except the final
    one) lies in [min_len, max_len]; every cut is either a candidate
    or an exact forced position last+max_len; and no SKIPPED candidate
    could legally have been chosen earlier (greedy optimality)."""
    n = data.draw(st.integers(min_value=0, max_value=500))
    cand = sorted(data.draw(st.sets(
        st.integers(min_value=1, max_value=max(1, n - 1)),
        max_size=60)))
    cand = [c for c in cand if c < n]
    min_len = data.draw(st.integers(min_value=1, max_value=50))
    max_len = data.draw(st.integers(min_value=min_len, max_value=120))
    cuts = cdc_cuts_clamped(cand, n, min_len, max_len)
    if n == 0:
        # the kernel never calls the cut law for empty docs; the pure
        # function itself must still return no cuts
        assert cuts == []
        return
    bounds = [0] + cuts + [n]
    assert bounds == sorted(set(bounds))
    cset = set(cand)
    for i in range(len(bounds) - 1):
        gap = bounds[i + 1] - bounds[i]
        final = i + 1 == len(bounds) - 1
        if not final:
            assert min_len <= gap <= max_len, (bounds, min_len, max_len)
        else:
            assert gap <= max_len or bounds[i] + max_len >= n
        if not final:
            cut = bounds[i + 1]
            assert cut in cset or cut == bounds[i] + max_len
            if cut == bounds[i] + max_len and cut not in cset:
                # forced => no candidate was available in the window
                assert not any(bounds[i] + min_len <= c <= bounds[i]
                               + max_len for c in cand)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.sampled_from(
    list("fi fl ffi No Rs !! a A") + ["ﬁ", "ﬂ", "ﬃ", "№", "₨", "‼",
                                      "ǉ", "ĳ", "œ", "а", "е", "о"]),
    max_size=80), st.randoms())
def test_confusable_chain_confluent(t, rnd):
    """The multi-char fold's result is independent of pair order —
    the confluence claim (one-codepoint sources, ASCII targets, no
    source inside any target) tested by applying a random permutation
    of the chain."""
    from ocr_automation_system_spark.functions.text import (
        CONFUSABLE_MULTI,
    )

    def fold(pairs):
        out = t
        for s, d in pairs:
            out = out.replace(s, d)
        return out

    perm = list(CONFUSABLE_MULTI)
    rnd.shuffle(perm)
    assert fold(perm) == fold(CONFUSABLE_MULTI)


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_blend_key_orders_like_the_rational_score(data):
    """The integer blend key (num*(3-band)*2^50 + 3*(den-num)*u) must
    order any two docs exactly as the rational score
    lam*(3-band)/3 + (1-lam)*u/2^50 with lam = num/den does —
    i.e. the exact-integer encoding loses nothing."""
    from fractions import Fraction

    den = data.draw(st.integers(min_value=1, max_value=16))
    num = data.draw(st.integers(min_value=0, max_value=den))
    rows = data.draw(st.lists(st.tuples(
        st.integers(min_value=0, max_value=3),        # band
        st.integers(min_value=0, max_value=(1 << 50) - 1)),  # u draw
        min_size=2, max_size=8))
    U = 1 << 50

    def key(band, u):
        return num * (3 - band) * U + 3 * (den - num) * u

    def score(band, u):
        lam = Fraction(num, den)
        return lam * Fraction(3 - band, 3) + (1 - lam) * Fraction(u, U)

    for a in rows:
        for b in rows:
            ka, kb = key(*a), key(*b)
            sa, sb = score(*a), score(*b)
            if sa < sb:
                assert ka < kb, (a, b, num, den)
            elif sa > sb:
                assert ka > kb, (a, b, num, den)
            else:
                assert ka == kb, (a, b, num, den)


# ---------------------------------------------------------------------------
# Full-PSL matcher vs an independent naive implementation
# ---------------------------------------------------------------------------


def _naive_psl(host: str, rules) -> tuple:
    """The published PSL algorithm, written independently of the
    matcher: collect all matching rules; an exception rule wins
    outright (suffix = rule minus its leftmost label); otherwise the
    prevailing rule is the longest match, a wildcard counting its
    star label; no match => the last label (implicit *)."""
    h = host.lower()
    labels = h.split(".")

    def tail(k):
        return ".".join(labels[-k:])

    exc = [(n, r) for r, n, k in rules
           if k == "e" and len(labels) >= n and tail(n) == r]
    if exc:
        n, r = max(exc)
        ps = n - 1
    else:
        ps = 1
        for r, n, k in rules:
            if k == "n" and len(labels) >= n and tail(n) == r:
                ps = max(ps, n)
            elif (k == "w" and len(labels) >= n + 1
                  and tail(n + 1).split(".", 1)[1] == r):
                ps = max(ps, n + 1)
    suffix = tail(ps)
    reg = tail(ps + 1) if len(labels) > ps else None
    return suffix, reg


def test_psl_matcher_agrees_with_naive_reference_on_real_rules(spark):
    """300 hosts assembled from the REAL bundled list (random normal /
    wildcard / exception rules with 0-3 random prefix labels, plus
    unlisted-TLD and suffix-is-host edges), matcher vs the naive
    published-algorithm implementation — exact agreement."""
    from ocr_automation_system_spark.functions.urlnorm import (
        psl_full_rules, registrable_domain_psl,
    )

    rules = list(psl_full_rules())
    rnd = random.Random(20260821)
    normals = [r for r in rules if r[2] == "n"]
    wilds = [r for r in rules if r[2] == "w"]
    excs = [r for r in rules if r[2] == "e"]
    hosts = set()
    while len(hosts) < 300:
        mode = rnd.random()
        if mode < 0.55:
            base = rnd.choice(normals)[0]
        elif mode < 0.75:
            # a wildcard rule needs one real label under the star
            base = "star%d.%s" % (rnd.randrange(9),
                                  rnd.choice(wilds)[0])
        elif mode < 0.85:
            base = rnd.choice(excs)[0]
        elif mode < 0.95:
            base = "host%d.unlisted%d" % (rnd.randrange(9),
                                          rnd.randrange(9))
        else:
            base = rnd.choice(rules)[0]  # host IS a rule text
        for _ in range(rnd.randrange(4)):
            base = "p%d.%s" % (rnd.randrange(99), base)
        hosts.add(base)
    hosts = sorted(hosts)
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {r["host"]: (r["public_suffix"], r["reg_domain"])
           for r in registrable_domain_psl(df, spark).collect()}
    bad = []
    for h in hosts:
        want = _naive_psl(h, rules)
        if got[h] != want:
            bad.append((h, got[h], want))
    assert not bad, bad[:5]


def test_gear_table_spot_independent_of_hashlib_path():
    """Belt-and-braces: the table's published derivation reproduced
    inline (no shared helper) for a handful of bytes."""
    G = gear_table()
    for b in (0, 1, 65, 128, 255):
        want = int(hashlib.md5(format(b, "02x").encode())
                   .hexdigest()[:8], 16)
        assert G[b] == want
