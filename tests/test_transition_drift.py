"""Transition (bigram / Markov-row) drift — checks/drift.py:transition_*.

The SEQUENTIAL-structure member of the drift family: per-(partition,
from_state) exact cross-multiplied integer TV of the outgoing-transition
distribution P(to | from) vs the baseline's transition matrix, built from
ONE lag/lead window keyed by the sequence id. Catches the failure class
no marginal or per-row contingency check can see: every distribution
intact, the ORDER of turns broken.
"""

import pytest
from pyspark.sql import functions as F

from taco_toolbox_spark.checks.drift import (
    END_TOKEN,
    START_TOKEN,
    transition_counts,
    transition_drift,
    transition_drift_violations,
    transition_pairs,
)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "part string, conv_id string, turn_idx int, role string"
    )


def _conv(part, cid, roles):
    return [(part, cid, i, r) for i, r in enumerate(roles)]


def _py_pairs(roles, boundaries=True):
    """Python reference: the transition pairs of one sequence."""
    rs = ["<null>" if r is None else r for r in roles]
    pairs = list(zip([START_TOKEN] + rs[:-1], rs))
    if boundaries:
        pairs.append((rs[-1], END_TOKEN))
    else:
        pairs = pairs[1:]
    return pairs


def _py_tv(part_counts, base_counts):
    n_part = sum(part_counts.values())
    n_base = sum(base_counts.values())
    cats = set(part_counts) | set(base_counts)
    num = sum(
        abs(part_counts.get(c, 0) * n_base - base_counts.get(c, 0) * n_part)
        for c in cats
    )
    return num / (2.0 * n_part * n_base)


def test_transition_pairs_exact_multiset(spark):
    rows = _conv("p", "c1", ["u", "a", "t", "a"]) + _conv("p", "c2", ["u"])
    df = _frame(spark, rows)
    got = sorted(
        (r["conv_id"], r["from_state"], r["to_state"])
        for r in transition_pairs(
            df, "conv_id", ("turn_idx",), "role"
        ).collect()
    )
    want = sorted(
        [("c1", a, b) for a, b in _py_pairs(["u", "a", "t", "a"])]
        + [("c2", a, b) for a, b in _py_pairs(["u"])]
    )
    assert got == want
    # without boundaries: interior bigrams only; the 1-turn conv vanishes
    got_nb = sorted(
        (r["conv_id"], r["from_state"], r["to_state"])
        for r in transition_pairs(
            df, "conv_id", ("turn_idx",), "role", include_boundaries=False
        ).collect()
    )
    want_nb = sorted(
        ("c1", a, b) for a, b in _py_pairs(["u", "a", "t", "a"], False)
    )
    assert got_nb == want_nb


def test_transition_pairs_null_state_is_not_a_boundary(spark):
    # a genuine NULL state mid-sequence must fold into '<null>' and NOT
    # masquerade as "first row" (the lag-NULL ambiguity the pre-coalesce
    # exists for)
    df = _frame(spark, _conv("p", "c", ["u", None, "a"]))
    got = sorted(
        (r["from_state"], r["to_state"])
        for r in transition_pairs(
            df, "conv_id", ("turn_idx",), "role"
        ).collect()
    )
    assert got == sorted(_py_pairs(["u", None, "a"]))
    assert (START_TOKEN, "<null>") not in got


def test_transition_pairs_rejects_colliding_columns(spark):
    df = _frame(spark, _conv("p", "c", ["u", "a"])).withColumn(
        "from_state", F.lit("x")
    )
    with pytest.raises(ValueError, match="from_state"):
        transition_pairs(df, "conv_id", ("turn_idx",), "role")


def test_transition_drift_matches_python_reference(spark):
    rows = (
        _conv("p1", "c1", ["u", "a", "u", "a"])
        + _conv("p1", "c2", ["u", "a", "a"])
        + _conv("p2", "c3", ["u", "u", "a"])
        + _conv("p2", "c4", ["a", "u", "a"])
    )
    df = _frame(spark, rows)
    base = transition_counts(df, "conv_id", ("turn_idx",), "role")
    # baseline == pooled pairs of the whole frame, python-recomputed
    convs = {
        "c1": ("p1", ["u", "a", "u", "a"]),
        "c2": ("p1", ["u", "a", "a"]),
        "c3": ("p2", ["u", "u", "a"]),
        "c4": ("p2", ["a", "u", "a"]),
    }
    py_base: dict[tuple[str, str], int] = {}
    py_part: dict[tuple[str, str, str], int] = {}
    for part, roles in convs.values():
        for a, b in _py_pairs(roles):
            py_base[(a, b)] = py_base.get((a, b), 0) + 1
            py_part[(part, a, b)] = py_part.get((part, a, b), 0) + 1
    assert base == py_base
    out = {
        (r["part"], r["from_state"]): r
        for r in transition_drift(
            df, "conv_id", ("turn_idx",), "role", "part", base
        ).collect()
    }
    for (part, frm), r in out.items():
        pc = {
            to: n for (p, a, to), n in py_part.items()
            if p == part and a == frm
        }
        bc = {to: n for (a, to), n in py_base.items() if a == frm}
        assert r["tv"] == pytest.approx(_py_tv(pc, bc), abs=0), (part, frm)
        assert r["n_part"] == sum(pc.values())
        assert r["n_base"] == sum(bc.values())


def test_transition_drift_sees_broken_order_intact_marginals(spark):
    # THE failure class this check exists for: state marginals identical
    # per partition (every conversation holds 2 u + 2 a), per-row
    # contingency unchanged — only the ORDER differs: p1 alternates
    # u,a,u,a; p2 runs u,u,a,a.
    rows = []
    for i in range(10):
        rows += _conv("p1", f"x{i}", ["u", "a", "u", "a"])
        rows += _conv("p2", f"y{i}", ["u", "u", "a", "a"])
    df = _frame(spark, rows)
    base = transition_counts(df, "conv_id", ("turn_idx",), "role")
    out = {
        (r["part"], r["from_state"]): r["tv"]
        for r in transition_drift(
            df, "conv_id", ("turn_idx",), "role", "part", base
        ).collect()
    }
    # both partitions sit strictly away from the pooled transition matrix
    # on the interior rows...
    assert out[("p1", "u")] > 0.2 and out[("p2", "u")] > 0.2
    assert out[("p1", "a")] > 0.2 and out[("p2", "a")] > 0.2
    # ...and the boundary rows agree (every conv opens u, closes a)
    assert out[("p1", START_TOKEN)] == 0.0
    assert out[("p2", START_TOKEN)] == 0.0
    # ...while the marginal check sees NOTHING
    from taco_toolbox_spark.checks.drift import (
        categorical_counts,
        categorical_tv,
    )

    marg = categorical_tv(df, "role", "part", categorical_counts(df, "role"))
    assert all(r["tv"] == 0.0 for r in marg.collect())


def test_transition_drift_bit_identical_across_partitioning(spark):
    rows = []
    for i in range(60):
        roles = [f"r{(i * j + j) % 4}" for j in range(1 + i % 5)]
        rows += _conv(f"p{i % 3}", f"c{i}", roles)
    df = _frame(spark, rows)
    base = transition_counts(df, "conv_id", ("turn_idx",), "role")
    one = {
        (r["part"], r["from_state"]): (r["tv_num"], r["tv"])
        for r in transition_drift(
            df.coalesce(1), "conv_id", ("turn_idx",), "role", "part", base
        ).collect()
    }
    many = {
        (r["part"], r["from_state"]): (r["tv_num"], r["tv"])
        for r in transition_drift(
            df.repartition(7), "conv_id", ("turn_idx",), "role", "part", base
        ).collect()
    }
    # == not approx: integer tv_num, one final division
    assert one == many


def test_transition_drift_novel_from_state_and_violations(spark):
    base_df = _frame(
        spark, sum((_conv("b", f"c{i}", ["u", "a"]) for i in range(10)), [])
    )
    base = transition_counts(base_df, "conv_id", ("turn_idx",), "role")
    cur = _frame(
        spark,
        _conv("p1", "d0", ["u", "u"])  # u now goes to u, base says a only
        + _conv("p2", "d1", ["zz", "a"]),  # from-state zz absent from base
    )
    td = transition_drift(cur, "conv_id", ("turn_idx",), "role", "part", base)
    out = {(r["part"], r["from_state"]): r for r in td.collect()}
    assert out[("p2", "zz")]["tv"] is None
    assert out[("p2", "zz")]["n_base"] is None
    assert out[("p1", "u")]["tv"] == pytest.approx(1.0, abs=0)
    details = sorted(
        r["detail"]
        for r in transition_drift_violations(td, 0.5, "td").collect()
    )
    assert any("transition_tv" in d and "from=u" in d for d in details)
    assert any("novel from-state zz" in d for d in details)


def test_transition_drift_check_in_engine_battery(spark):
    from taco_toolbox_spark.checks.base import TransitionDriftCheck
    from taco_toolbox_spark.engine import EngineConfig, run_validation

    rows = []
    for i in range(20):
        rows += _conv("p0", f"a{i}", ["u", "a", "u", "a"])
        rows += _conv("p1", f"b{i}", ["u", "a", "u", "a"])
        rows += _conv("p2", f"c{i}", ["u", "u", "a", "a"])  # order broke
    df = _frame(spark, rows)
    base = _frame(
        spark,
        sum((_conv("b", f"z{i}", ["u", "a", "u", "a"]) for i in range(40)),
            []),
    )
    cfg = EngineConfig(partition_col="part", group_col="conv_id",
                       order_col="turn_idx", key_cols=("conv_id", "turn_idx"))
    # empty seq/order resolve to the engine's group_col / order_col
    res = run_validation(
        df,
        [TransitionDriftCheck(check_id="role_flow", state_expr="role",
                              threshold=0.3)],
        cfg,
        baseline=base,
    )
    verdicts = {r["part"]: r["passed"] for r in res.verdicts.collect()}
    assert verdicts == {"p0": True, "p1": True, "p2": False}
    v = res.violations.collect()
    assert {x["part"] for x in v} == {"p2"}
    assert all(x["check_id"] == "role_flow" for x in v)

    with pytest.raises(ValueError, match="role_flow"):
        run_validation(
            df,
            [TransitionDriftCheck(check_id="role_flow", state_expr="role")],
            cfg,
        )


def test_transition_drift_suite_type(spark):
    from taco_toolbox_spark.suite import SuiteError, parse_suite

    spec = {
        "engine": {"partition_col": "part", "group_col": "conv_id",
                   "order_col": "turn_idx"},
        "checks": [
            {"type": "transition_drift", "id": "role_flow", "state": "role",
             "baseline_counts": {"<start>": {"user": 10},
                                 "user": {"assistant": 10}}},
        ],
    }
    suite = parse_suite(spec)
    c = suite.checks[0]
    assert c.state_expr == "role"
    assert c.seq_col == "" and c.order_cols == ()
    assert c.include_boundaries is True
    assert c.baseline_counts == {("<start>", "user"): 10,
                                 ("user", "assistant"): 10}
    dumped = suite.dump()["checks"][0]
    assert dumped["threshold"] == 0.25
    assert dumped["boundaries"] is True
    assert parse_suite(suite.dump()).dump() == suite.dump()

    explicit = parse_suite({"checks": [
        {"type": "transition_drift", "id": "t", "state": "role",
         "seq": "sess", "order": ["ts", "event_id"], "boundaries": False}]})
    c2 = explicit.checks[0]
    assert c2.seq_col == "sess" and c2.order_cols == ("ts", "event_id")
    assert c2.include_boundaries is False

    with pytest.raises(SuiteError, match="missing required key 'state'"):
        parse_suite({"checks": [
            {"type": "transition_drift", "id": "bad"}]})
    with pytest.raises(SuiteError, match="nested object"):
        parse_suite({"checks": [
            {"type": "transition_drift", "id": "bad", "state": "role",
             "baseline_counts": {"x": 3}}]})
    with pytest.raises(SuiteError, match="boolean"):
        parse_suite({"checks": [
            {"type": "transition_drift", "id": "bad", "state": "role",
             "boundaries": "yes"}]})
    with pytest.raises(SuiteError, match="unparseable"):
        parse_suite({"checks": [
            {"type": "transition_drift", "id": "bad",
             "state": "SELEC bogus ("}]})
