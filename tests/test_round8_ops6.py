"""Round-8 continuation batch 4: vocabulary growth curve, experiment
power analysis, Huber robust regression — Python-model checks."""

import math
import os
import random
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_vocab_growth_matches_counter_model(spark):
    from p6__mapreduce_spark.operators.text_analysis import vocab_growth_curve

    rng = random.Random(7)
    vocab_pool = [f"w{i}" for i in range(60)]
    texts = []
    for i in range(40):
        # later docs draw from a wider pool -> real growth curve
        pool = vocab_pool[: 10 + i]
        texts.append(" ".join(rng.choice(pool) for _ in range(30)))
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["checkpoint"]: r for r in vocab_growth_curve(df, n_checkpoints=8).collect()}
    # model
    first_doc = {}
    tokens_per_doc = []
    for i, t in enumerate(texts):
        ws = t.split()
        tokens_per_doc.append(len(ws))
        for w in ws:
            first_doc.setdefault(w, i)
    n = len(texts)
    ck_of = lambda rk: math.ceil(rk * 8.0 / n)  # noqa: E731
    for ck in sorted(got):
        docs_through = sum(1 for i in range(n) if ck_of(i + 1) <= ck)
        cum_types = sum(1 for w, fd in first_doc.items() if ck_of(fd + 1) <= ck)
        cum_tokens = sum(tokens_per_doc[i] for i in range(n) if ck_of(i + 1) <= ck)
        r = got[ck]
        assert r["docs_through"] == docs_through
        assert r["cum_types"] == cum_types
        assert r["cum_tokens"] == cum_tokens
        assert r["type_token_ratio"] == cum_types * 1.0 / cum_tokens
    # growth is cumulative-monotone and saturating-ish
    cks = sorted(got)
    types = [got[c]["cum_types"] for c in cks]
    assert types == sorted(types)
    assert types[-1] == len(first_doc)


def test_ab_power_matches_formula(spark):
    from p6__mapreduce_spark.operators.causal import ab_power_mde

    rng = random.Random(3)
    rows, eid = [], 0
    for u in range(200):
        day = f"2024-05-{(u % 9) + 1:02d}"
        rows.append((eid, f"{day} 08:00:00", u, "view", 1.0))
        eid += 1
        if rng.random() < 0.3:
            rows.append((eid, f"{day} 09:00:00", u, "purchase", 5.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    )
    got = {r["metric"]: r for r in ab_power_mde(df).collect()}
    n_units = got["view"]["n_units"]
    p = got["purchase"]["n_hits"] / n_units
    za, zb = 1.959963984540054, 0.8416212335729143
    exp_mde = (za + zb) * math.sqrt(2 * p * (1 - p) / (n_units / 2.0))
    assert abs(got["purchase"]["mde_abs"] - exp_mde) < 1e-12
    exp_n = 2 * (za + zb) ** 2 * p * (1 - p) / (0.05 * p) ** 2
    assert got["purchase"]["n_arm_for_5pct_rel"] == math.ceil(exp_n)
    assert got["view"]["p_base"] == 1.0  # every unit has its view
    # rarer metric -> larger relative MDE at fixed n
    assert got["purchase"]["mde_rel"] > got["view"]["mde_rel"] or got["view"]["p_base"] == 1.0


def _mk_orders(spark, day_cents):
    rows = []
    for i, (day, cents) in enumerate(day_cents):
        rows.append((i + 1, 1, "O", cents / 100.0, day, "1-URGENT"))
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    )


def test_huber_downweights_planted_outliers(spark):
    """Clean linear trend + 3 huge outlier days: OLS slope is dragged,
    Huber's stays near truth and the outlier days carry low weight."""
    from p6__mapreduce_spark.operators.robust import huber_regression_daily

    day_cents = []
    for d in range(60):
        base = 100_000 + 500 * d  # slope 500 cents/day
        if d in (10, 30, 50):
            base += 5_000_000  # outliers
        day_cents.append((f"2024-0{1 + d // 28}-{d % 28 + 1:02d}", base))
    df = _mk_orders(spark, day_cents)
    r = huber_regression_daily(df).collect()[0]
    assert abs(r["b_huber"] - 500.0) < 60.0  # near the true slope
    assert abs(r["b_ols"] - 500.0) > abs(r["b_huber"] - 500.0)
    assert r["eff_weight"] < 1.0  # something was downweighted
    assert r["n_days"] == 60


def test_huber_equals_ols_on_clean_inliers(spark):
    """All residuals inside delta -> weights exactly 1, so the Huber
    fit equals OLS to the coefficient quantization step."""
    from p6__mapreduce_spark.operators.robust import huber_regression_daily

    day_cents = [
        (f"2024-01-{d + 1:02d}", 1_000_000 + 200 * d + (50 if d % 2 else -50))
        for d in range(25)
    ]
    df = _mk_orders(spark, day_cents)
    r = huber_regression_daily(df).collect()[0]
    assert r["eff_weight"] == 1.0
    assert abs(r["b_huber"] - r["b_ols"]) < 1e-3  # 1e-4 quantization grid
    assert abs(r["a_huber"] - r["a_ols"]) < 1e-3
