import pytest
from pyspark.sql import functions as F

from taco_toolbox_spark.checks import FunctionalDependencyCheck, fd_violations
from taco_toolbox_spark.engine import run_validation


@pytest.fixture(scope="module")
def fd_df(spark):
    rows = [
        # tool -> role holds for 'search' in part p1...
        ("p1", "c1", 0, "tool", "search"),
        ("p1", "c1", 1, "tool", "search"),
        # ...but breaks in p2 (tool_on_chat shape)
        ("p2", "c2", 0, "tool", "search"),
        ("p2", "c2", 1, "user", "search"),
        # NULL dependent is a variant of its own
        ("p2", "c3", 0, "tool", "code"),
        ("p2", "c3", 1, None, "code"),
        # NULL determinant forms a group; consistent here
        ("p1", "c4", 0, "user", None),
        ("p1", "c4", 1, "user", None),
    ]
    return spark.createDataFrame(
        rows, "part string, conv_id string, turn_idx int, role string, tool string"
    )


def test_fd_violations_standalone(fd_df):
    got = {
        (r["part"], r["tool"]): (r["n_variants"], r["n_rows"])
        for r in fd_violations(fd_df, ["tool"], ["role"], "part").collect()
    }
    assert got == {("p2", "search"): (2, 2), ("p2", "code"): (2, 2)}


def test_fd_null_dependent_is_distinct_variant(fd_df):
    v = {
        r["tool"]: (r["variant_min"], r["variant_max"])
        for r in fd_violations(fd_df, ["tool"], ["role"], "part").collect()
    }
    lo, hi = v["code"]
    assert lo == "\x00" and hi == "tool"  # NULL sentinel vs real value


def test_fd_holds_globally_unscoped_still_fires(fd_df):
    # without partition scoping 'search' still maps to {tool, user}
    got = {r["tool"] for r in fd_violations(fd_df, ["tool"], ["role"]).collect()}
    assert got == {"search", "code"}
    # and a true FD yields the empty frame
    assert fd_violations(fd_df, ["conv_id"], ["part"]).count() == 0


def test_fd_guards(fd_df):
    with pytest.raises(ValueError, match="determinant and dependent"):
        fd_violations(fd_df, [], ["role"])
    with pytest.raises(ValueError, match="vacuous"):
        fd_violations(fd_df, ["tool"], ["tool", "role"])
    bad = fd_df.withColumn("n_variants", F.lit(1))
    with pytest.raises(ValueError, match="collide"):
        fd_violations(bad, ["tool"], ["role"])


def test_fd_check_in_battery(fd_df):
    res = run_validation(
        fd_df,
        [
            FunctionalDependencyCheck(
                check_id="tool_role_fd",
                description="tool -> role",
                determinant=["tool"],
                dependent=["role"],
            )
        ],
    )
    viol = res.violations.collect()
    assert {(v["part"], v["conv_id"]) for v in viol} == {
        ("p2", "search"),
        ("p2", "code"),
    }
    assert all(v["check_id"] == "tool_role_fd" for v in viol)
    assert all("2 variants over 2 rows" in v["detail"] for v in viol)
    verd = {
        (v["part"], v["passed"])
        for v in res.verdicts.filter("check_id = 'tool_role_fd'").collect()
    }
    assert verd == {("p1", True), ("p2", False)}
    res.release()


def test_fd_check_on_corrupted_corpus(corpus):
    """tool_on_chat corruption puts tool='search' on a non-tool role, so
    the FD tool -> role must flag 'search' while leaving un-corrupted
    tools alone; the clean corpus passes entirely. skip_null_determinant
    exempts the tool-less turns (NULL tool legitimately spans roles)."""
    check = FunctionalDependencyCheck(
        check_id="tool_role_fd",
        determinant=["tool"],
        dependent=["role"],
        skip_null_determinant=True,
    )
    assert run_validation(corpus.clean, [check]).violations.count() == 0
    viol = run_validation(corpus.corrupted, [check]).violations
    rows = viol.collect()
    assert rows
    flagged = {r["conv_id"] for r in rows}
    # tool_on_chat puts 'search' on a chat role; bad_role puts 'narrator'
    # on tool turns, breaking other tools' FD too — all flagged values
    # must be real tool names, and 'search' must be among them
    assert "search" in flagged
    from taco_toolbox_spark.schema import TOOL_VOCAB

    assert flagged <= set(TOOL_VOCAB)


def test_fd_null_determinant_group_strict_vs_skip(spark):
    df = spark.createDataFrame(
        [("x", "user"), (None, "user"), (None, "tool")],
        "tool string, role string",
    )
    # strict: the NULL-tool group maps to {user, tool} -> one violation
    assert fd_violations(df, ["tool"], ["role"]).count() == 1
    # optional-key semantics: NULL-determinant rows are exempt
    assert (
        fd_violations(df, ["tool"], ["role"], skip_null_determinant=True).count()
        == 0
    )


def test_fd_partition_col_overlap_guard(fd_df):
    with pytest.raises(ValueError, match="partition column"):
        fd_violations(fd_df, ["conv_id"], ["part"], "part")
    with pytest.raises(ValueError, match="partition column"):
        fd_violations(fd_df, ["part"], ["role"], "part")
    # the FD ONTO the partition is expressible unscoped
    assert fd_violations(fd_df, ["conv_id"], ["part"]).count() == 0


def test_fd_multi_determinant_battery_coordinate(spark):
    """The violation coordinate must carry the FULL determinant tuple so
    multi-column determinants stay distinguishable and actionable."""
    df = spark.createDataFrame(
        [
            ("p1", "search", "m1", "tool"),
            ("p1", "search", "m1", "user"),   # (search, m1) broken
            ("p1", "search", "m2", "tool"),   # (search, m2) holds
            ("p1", None, "m1", "tool"),
            ("p1", None, "m1", "user"),       # (NULL, m1) broken (strict)
        ],
        "part string, tool string, model string, role string",
    )
    res = run_validation(
        df,
        [
            FunctionalDependencyCheck(
                check_id="fd2",
                determinant=["tool", "model"],
                dependent=["role"],
            )
        ],
    )
    rows = res.violations.collect()
    assert {r["conv_id"] for r in rows} == {"search,m1", "<null>,m1"}
    assert all("(search,m1)" in r["detail"] or "(<null>,m1)" in r["detail"]
               for r in rows)
    res.release()


def test_fd_variants_counted_on_exact_columns_not_serialization(spark):
    """Dependent values containing the chr(31) separator must not let two
    distinct variants collapse into one serialized string and produce a
    false pass (review finding): ('x\\x1f', 'y') vs ('x', '\\x1fy') are
    different combos even though both render as 'x\\x1f\\x1fy'."""
    from taco_toolbox_spark.checks.fd import fd_violations

    df = spark.createDataFrame(
        [("k", "x\x1f", "y"), ("k", "x", "\x1fy")],
        "det string, a string, b string",
    )
    v = fd_violations(df, ["det"], ["a", "b"]).collect()
    assert len(v) == 1 and v[0]["n_variants"] == 2
