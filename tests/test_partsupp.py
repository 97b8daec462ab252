"""partsupp TPC-H patterns (q2/q9/q11/q16/q20) against a synthetic
partsupp fixture: /root/testdata ships no partsupp table, so these
queries are gated behind register_partsupp_queries(); here we force
registration and oracle-check each pattern against DuckDB on a tmp
sf-dir assembled from sf0.001 symlinks + a deterministic partsupp."""

import importlib.util
import os

import pytest

from knime_core_columnar_spark import catalog

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

_spec = importlib.util.spec_from_file_location(
    "kccs_check", os.path.join(os.path.dirname(__file__), "..", "tools", "check.py")
)
_check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_check)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="testdata not present"
)


@pytest.fixture(scope="module")
def ps_dir(tmp_path_factory):
    """sf0.001 clone (symlinks) plus a deterministic synthetic partsupp."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sf_ps")
    for t in TABLES:
        os.symlink(f"{SF}/{t}.parquet", d / f"{t}.parquet")

    n_part = pq.read_metadata(f"{SF}/part.parquet").num_rows
    n_supp = pq.read_metadata(f"{SF}/supplier.parquet").num_rows
    rows = []
    for p in range(1, n_part + 1):
        for k in range(2):  # two suppliers per part, deterministic
            s = (p * 3 + k * 7) % n_supp + 1
            rows.append(
                (p, s, (p * 13 + s) % 1000, round(((p * 17 + s) % 5000) / 100.0, 2))
            )
    # dedupe (p, s) collisions keeping the first
    seen, uniq = set(), []
    for r in rows:
        if r[:2] not in seen:
            seen.add(r[:2])
            uniq.append(r)
    t = pa.table(
        {
            "ps_partkey": pa.array([r[0] for r in uniq], pa.int64()),
            "ps_suppkey": pa.array([r[1] for r in uniq], pa.int64()),
            "ps_availqty": pa.array([r[2] for r in uniq], pa.int32()),
            "ps_supplycost": pa.array([r[3] for r in uniq], pa.float64()),
        }
    )
    pq.write_table(t, d / "partsupp.parquet")
    return str(d)


@pytest.fixture(scope="module")
def duck(ps_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES + ["partsupp"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{ps_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", list(catalog.PARTSUPP_QUERIES))
def test_partsupp_pattern_matches_oracle(spark, ps_dir, duck, name):
    catalog.register_partsupp_queries(force=True)
    fn = catalog.QUERIES[name]
    sql = catalog.ORACLES[name]
    assert not _check.oracle_type_problems(duck, sql), "oracle emits HUGEINT"
    spdf = fn(spark, ps_dir).toPandas()
    opdf = duck.execute(sql).fetchdf()
    assert len(spdf) == len(opdf), f"{name}: rowcount {len(spdf)} vs {len(opdf)}"
    assert len(spdf) > 0, f"{name}: empty result proves nothing"
    assert sorted(spdf.columns) == sorted(opdf.columns)
    sm = _check.frame_to_multiset(spdf)
    om = _check.frame_to_multiset(opdf)
    assert sm == om, f"{name}: first diff {next((a, b) for a, b in zip(sm, om) if a != b)}"
