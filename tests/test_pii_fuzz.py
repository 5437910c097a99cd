"""Hypothesis fuzz for the X153 validators and the X157 solver:
checksum ground truth from first principles (textbook Luhn, int %97),
and waterfill conservation/cap invariants on arbitrary censuses."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_automation_system_spark.functions.curation import mixture_waterfill
from ocr_automation_system_spark.functions.pii import (
    iban_valid_py,
    luhn_valid_py,
)


def _luhn_textbook(digits: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.text(alphabet="0123456789", min_size=13, max_size=19),
       st.sampled_from(["", " ", "-"]))
def test_luhn_matches_textbook(digits, sep):
    cand = sep.join([digits[i:i + 4] for i in range(0, len(digits), 4)])
    assert luhn_valid_py(cand) == _luhn_textbook(digits)


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.text(alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZ", min_size=2,
               max_size=2),
       st.integers(min_value=0, max_value=99),
       st.text(alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
               min_size=11, max_size=30))
def test_iban_mod97_matches_bigint(cc, chk, bban):
    cand = f"{cc}{chk:02d}{bban}"
    s = cand[4:] + cand[:4]
    expanded = "".join(str(ord(c) - 55) if c.isalpha() else c for c in s)
    assert iban_valid_py(cand) == (int(expanded) % 97 == 1)


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=10**9),
                          st.integers(min_value=1, max_value=100)),
                min_size=1, max_size=12),
       st.integers(min_value=0, max_value=2 * 10**9))
def test_waterfill_invariants(pairs, budget):
    census = [(f"s{i}", a, w) for i, (a, w) in enumerate(pairs)]
    out = mixture_waterfill(census, budget)
    total_avail = sum(a for _, a, _ in census)
    alloc_total = sum(al for *_, al, _ in out)
    # never over-assigns the budget unless supply itself is the bound
    assert alloc_total <= max(budget, 0) or alloc_total == total_avail
    for (_, a, _w, al, sat) in out:
        assert 0 <= al <= a
        if sat:
            assert al == a
    # budget >= supply -> everything taken
    if budget >= total_avail:
        assert alloc_total == total_avail
