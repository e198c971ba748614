"""The DSIR / NB log-ratio arithmetic lifts each smoothed count to
double BEFORE the multiply (r14 verdict task 8).  Two properties pin
the claim:

1. EXACTNESS AT FIXTURE SCALE: while every factor is < 2^53, the
   double product is exact, so floor(ln(ratio) * 1e6) from the lifted
   path equals the reference computed with Python's unbounded ints —
   the oracle pairs stay bit-identical.
2. OVERFLOW-PROOF AT 100 TB: for corpus-scale counts (~1e14) the old
   bigint product wraps int64 (the caveat the code used to carry as a
   comment); the lifted path stays finite and within 1 micro-nat of
   the unbounded-precision value.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

B = 256


def _lifted_micro(tb: int, rtot: int, rb: int, ttot: int) -> int:
    """The production arithmetic: per-factor float lift, one multiply,
    one divide, floor to micro-nats."""
    num = float(tb + 1) * float(rtot + B)
    den = float(rb + 1) * float(ttot + B)
    return math.floor(math.log(num / den) * 1_000_000)


def _exact_micro(tb: int, rtot: int, rb: int, ttot: int) -> int:
    """Reference: unbounded-int products, log via Fraction-free
    two-term form with math.log on exact ints (Python floats from
    huge ints are correctly rounded, and we only need 1e-6 slack)."""
    num = (tb + 1) * (rtot + B)
    den = (rb + 1) * (ttot + B)
    # math.log of an unbounded int is computed at full precision
    return math.floor((math.log(num) - math.log(den)) * 1_000_000)


@given(
    tb=st.integers(0, 1 << 20),
    extra=st.integers(0, 1 << 24),
    rb_extra=st.integers(0, 1 << 20),
    t_extra=st.integers(0, 1 << 24),
)
@settings(max_examples=300, deadline=None)
def test_lift_exact_in_fixture_regime(tb, extra, rb_extra, t_extra):
    """Factors < 2^53 -> the lifted product is exact, so the single
    log of the exact ratio equals itself computed any exact way
    (modulo the floor's 1-ulp sensitivity, which both paths share
    because they form the SAME correctly-rounded double ratio)."""
    rb = tb + rb_extra            # raw >= target by construction
    rtot = rb + extra
    ttot = tb + t_extra
    if ttot > rtot:
        rtot, ttot = ttot, rtot
    num = float(tb + 1) * float(rtot + B)
    den = float(rb + 1) * float(ttot + B)
    # exactness of the lift itself: the double product IS the integer
    assert num == (tb + 1) * (rtot + B)
    assert den == (rb + 1) * (ttot + B)
    got = _lifted_micro(tb, rtot, rb, ttot)
    # cross-check against a visibly-different exact evaluation; the
    # two can only disagree when ln(ratio)*1e6 sits within float error
    # of an integer — allow that single-micro boundary case
    ref = _exact_micro(tb, rtot, rb, ttot)
    assert abs(got - ref) <= 1


def test_lift_survives_100tb_counts_where_bigint_wraps():
    # ~100 TB corpus: 1e14 grams total, a hot bucket holding 1e12
    tb, rb = 10**12, 3 * 10**12
    ttot, rtot = 2 * 10**13, 10**14
    # the OLD path's products wrap int64 (the documented caveat)
    assert (tb + 1) * (rtot + B) > np.iinfo(np.int64).max
    with np.errstate(over="ignore"):
        wrapped = np.int64(np.uint64((tb + 1) * (rtot + B)
                                     % (1 << 64)))
    assert wrapped != (tb + 1) * (rtot + B)
    # the lifted path stays finite and within 1 micro of exact
    got = _lifted_micro(tb, rtot, rb, ttot)
    ref = _exact_micro(tb, rtot, rb, ttot)
    assert math.isfinite(got) and abs(got - ref) <= 1
