"""operators/validate.py — declarative constraint suite."""

from pyspark.sql import functions as F

from knime_core_columnar_spark.operators.validate import (
    accepted_values,
    fk_exists,
    in_range,
    matches_regex,
    not_null,
    row_count_between,
    unique,
    validate,
)


def test_validate_row_level_checks(spark):
    df = spark.createDataFrame(
        [
            (1, "a@x.com", 10.0, "en"),
            (2, None, -5.0, "de"),
            (3, "bad-email", 200.0, "xx"),
            (3, "c@y.org", 50.0, "en"),
        ],
        "id int, email string, v double, lang string",
    )
    rep = {
        r["check"]: r
        for r in validate(
            df,
            [
                not_null("email"),
                in_range("v", 0, 100),
                matches_regex("email", r"^[^@]+@[^@]+\.[^@]+$"),
                accepted_values("lang", ["en", "de"]),
                unique("id"),
                row_count_between(1, 10),
            ],
        ).collect()
    }
    assert rep["not_null(email)"]["n_violations"] == 1
    assert rep["in_range(v,0,100)"]["n_violations"] == 2  # -5 and 200
    assert rep["matches_regex(email)"]["n_violations"] == 1  # NULL skipped
    assert rep["accepted_values(lang)"]["n_violations"] == 1
    assert rep["unique(id)"]["n_violations"] == 1  # one extra row for id=3
    assert rep["row_count_between(1,10)"]["status"] == "pass"
    assert all(r["n_rows"] == 4 for r in rep.values())
    assert rep["not_null(email)"]["status"] == "fail"


def test_validate_fk_and_clean_table(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id int, ref int"
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pid int")
    rep = {
        r["check"]: r
        for r in validate(
            child, [fk_exists(["ref"], parent, ["pid"]), not_null("id")]
        ).collect()
    }
    # 99 is an orphan; the NULL ref is skipped (fk checks non-null keys)
    assert rep["fk_exists(ref)"]["n_violations"] == 1
    assert rep["not_null(id)"]["status"] == "pass"
    clean = validate(parent, [not_null("pid"), unique("pid")])
    assert all(r["status"] == "pass" for r in clean.collect())


def test_validate_on_tpch_referential(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    rep = {
        r["check"]: r
        for r in validate(
            orders,
            [
                not_null("o_orderkey"),
                unique("o_orderkey"),
                fk_exists(["o_custkey"], customer, ["c_custkey"]),
                row_count_between(1, None),
            ],
        ).collect()
    }
    assert all(r["status"] == "pass" for r in rep.values())
    assert rep["unique(o_orderkey)"]["n_rows"] == orders.count()


def test_numeric_drift_report_hand_bins(spark):
    from knime_core_columnar_spark.operators.validate import (
        numeric_drift_report,
    )

    old = spark.createDataFrame(
        [(5.0,), (15.0,), (15.5,), (-3.0,), (100.0,), (None,)], "value double"
    )
    new = spark.createDataFrame(
        [(5.0,), (25.0,), (25.1,), (25.2,)], "value double"
    )
    out = {r["bin"]: r for r in
           numeric_drift_report(old, new, "value", 0.0, 30.0, 3).collect()}
    # old: bin 0 (5), bin 1 (15, 15.5), underflow -1 (-3), overflow 3 (100);
    # NULL excluded. new: bin 0 (5), bin 2 (25, 25.1, 25.2)
    assert (out[0]["n_old"], out[0]["n_new"]) == (1, 1)
    assert (out[1]["n_old"], out[1]["n_new"]) == (2, 0)
    assert (out[2]["n_old"], out[2]["n_new"]) == (0, 3)
    assert (out[-1]["n_old"], out[-1]["n_new"]) == (1, 0)
    assert (out[3]["n_old"], out[3]["n_new"]) == (1, 0)
    assert out[2]["pct_new"] == 0.75 and out[2]["pct_old"] == 0.0
    assert out[1]["pct_old"] == 0.4  # 2/5 non-null old rows
    # percentages sum to 1 on both sides (no row lost to binning)
    assert round(sum(r["pct_old"] for r in out.values()), 6) == 1.0
    assert round(sum(r["pct_new"] for r in out.values()), 6) == 1.0
