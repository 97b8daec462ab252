"""Property-based tests (hypothesis) — beyond the reference's
example-based strategy (SURVEY §5 notes it has no randomized testing)."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from knime_core_columnar_spark.schema import merge_schemas, promote_types

_TYPES = [
    T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
    T.FloatType(), T.DoubleType(), T.StringType(), T.BooleanType(),
    T.DateType(), T.TimestampType(), T.BinaryType(),
]
types_st = st.sampled_from(_TYPES)


@given(a=types_st, b=types_st)
def test_promote_commutative(a, b):
    assert promote_types(a, b) == promote_types(b, a)


@given(a=types_st)
def test_promote_idempotent(a):
    assert promote_types(a, a) == a


@given(a=types_st, b=types_st)
def test_promote_upper_bound(a, b):
    """The result is never a narrower numeric than either input."""
    rank = {T.ByteType(): 1, T.ShortType(): 2, T.IntegerType(): 3,
            T.LongType(): 4, T.FloatType(): 5, T.DoubleType(): 6}
    m = promote_types(a, b)
    if a in rank and b in rank and m in rank:
        assert rank[m] >= max(rank[a], rank[b])
    # non-numeric mixes fall back to string under allow_varying
    if (a in rank) != (b in rank):
        assert isinstance(m, (T.StringType, T.DoubleType))


@given(
    names=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=5, unique=True
    ),
    extra=st.sampled_from(["x", "y"]),
)
@settings(max_examples=30)
def test_merge_schemas_order_and_nullability(names, extra):
    """First-seen column order is preserved; columns absent from one
    input become nullable."""
    s1 = T.StructType([T.StructField(n, T.IntegerType(), False) for n in names])
    s2 = T.StructType([T.StructField(extra, T.StringType(), False)])
    m = merge_schemas([s1, s2])
    expected = list(names) + ([extra] if extra not in names else [])
    assert [f.name for f in m.fields] == expected
    for f in m.fields:
        if f.name == extra and extra not in names:
            assert f.nullable  # absent from s1
        if f.name in names and f.name != extra:
            assert f.nullable  # absent from s2


@given(
    vals=st.lists(st.integers(min_value=-2**31, max_value=2**31 - 1),
                  min_size=1, max_size=20, unique=True)
)
@settings(max_examples=10, deadline=None)
def test_concatenate_uniquify_preserves_multiplicity(spark_session, vals):
    """UNIQUIFY on self-concatenation always yields 2n unique keys and
    every original key survives unsuffixed."""
    from pyspark.sql import functions as F

    from knime_core_columnar_spark.table import ColumnarTable, RowIdPolicy

    df = spark_session.createDataFrame([(str(v), v) for v in vals], "_row_key string, v int")
    t = ColumnarTable(df)
    out = t.concatenate([t], row_id_policy=RowIdPolicy.UNIQUIFY_WITH_SUFFIX)
    keys = [r["_row_key"] for r in out.df.collect()]
    assert len(keys) == 2 * len(vals) == len(set(keys))
    assert set(str(v) for v in vals) <= set(keys)
    assert all(k.endswith("_dup") or not k.endswith("_dup") for k in keys)


def _reference_uniquify(keys: list[str]) -> list[str]:
    """Brute-force simulation of the reference's sequential semantics
    (ColumnarConcatenater.java:252-292): process rows in order, append
    '_dup' until the key is not among the keys emitted so far."""
    used: set[str] = set()
    out = []
    for k in keys:
        while k in used:
            k = k + "_dup"
        used.add(k)
        out.append(k)
    return out


@given(
    roots=st.lists(
        st.tuples(
            st.sampled_from(["k", "key", "x_dup", "a"]),
            st.integers(min_value=0, max_value=3),  # pre-existing depth
        ),
        min_size=1, max_size=12,
    )
)
@settings(max_examples=15, deadline=None)
def test_concatenate_uniquify_matches_sequential_reference(
    spark_session, roots
):
    """DIFFERENTIAL: the single-pass parking greedy must equal the
    reference's sequential append-until-unique on arbitrary mixes of
    pre-suffixed keys — including roots that themselves end in _dup
    (x_dup: depth parsing must not strip the root's own suffix into the
    family of 'x'). Keys are fed as ONE table so the row order the
    implementation uses (src, then original key) is reproducible: the
    reference simulation consumes the same sorted order."""
    from pyspark.sql import functions as F

    from knime_core_columnar_spark.table import ColumnarTable, RowIdPolicy

    keys = [root + "_dup" * d for root, d in roots]
    # implementation order within one table is (src, original key):
    # replicate it for the sequential reference
    ordered = sorted(keys)
    expect = sorted(_reference_uniquify(ordered))
    df = spark_session.createDataFrame(
        [(k, i) for i, k in enumerate(keys)], "_row_key string, v int"
    )
    t = ColumnarTable(df)
    out = t.concatenate([], row_id_policy=RowIdPolicy.UNIQUIFY_WITH_SUFFIX)
    got = sorted(r["_row_key"] for r in out.df.collect())
    assert got == expect
    assert len(set(got)) == len(keys)


@settings(max_examples=20, deadline=None)
@given(
    text=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=600
    ),
    chunk=st.integers(min_value=10, max_value=200),
    overlap=st.integers(min_value=0, max_value=9),
)
def test_chunk_text_reconstructs_document(spark_session, text, chunk, overlap):
    """Dropping each chunk's overlap prefix (after the first) and
    concatenating reconstructs the original text exactly."""
    from knime_core_columnar_spark.operators.text import chunk_text

    df = spark_session.createDataFrame([(1, text)], "doc_id long, text string")
    rows = (
        chunk_text(df, chunk_chars=chunk, overlap=overlap)
        .orderBy("chunk_idx")
        .collect()
    )
    step = chunk - overlap
    rebuilt = rows[0]["chunk_text"] + "".join(
        r["chunk_text"][overlap:] for r in rows[1:]
    )
    assert rebuilt == text
    # every chunk starts where the previous one ended minus the overlap
    assert [r["chunk_start"] for r in rows] == [i * step for i in range(len(rows))]


def test_upsert_identity(spark_session):
    """upsert(base, base) == base (every row matched, replaced by itself)."""
    from knime_core_columnar_spark.operators.relational import upsert

    base = spark_session.createDataFrame(
        [(1, "a", None), (2, None, 2.5)], "k int, s string, v double"
    )
    out = upsert(base, base, ["k"])
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, base.collect()))


# --- round-3 operator invariants (Spark-backed, small deterministic corpora) -


word_st = st.text(alphabet="abcdefg", min_size=1, max_size=3)
doc_st = st.lists(word_st, min_size=0, max_size=40).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(texts=st.lists(doc_st, min_size=1, max_size=8))
def test_segment_dedup_invariants(spark, texts):
    """n_kept <= n_chunks; every doc survives as a row; total kept
    chunks across the corpus equals the number of DISTINCT chunks."""
    from knime_core_columnar_spark.operators.dedup import segment_dedup

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = segment_dedup(df, words_per_chunk=5).collect()
    assert len(out) == len(texts)
    assert all(0 <= r["n_kept"] <= r["n_chunks"] for r in out)
    # distinct-chunk accounting: kept count == global distinct segments
    chunks = set()
    for t in texts:
        words = (t if t else "").split(" ")
        for i in range(0, len(words), 5):
            chunks.add(" ".join(words[i : i + 5]))
    assert sum(r["n_kept"] for r in out) == len(chunks)


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
        min_size=1,
        max_size=12,
    )
)
def test_impute_invariants(spark, vals):
    """Fills never alter non-null cells; ffill/bfill results are drawn
    from the observed values; linear stays within the anchor envelope."""
    from knime_core_columnar_spark.operators.impute import impute

    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    observed = [v for v in vals if v is not None]
    for strat in ("previous", "next", "linear"):
        got = {
            r["i"]: r["f"]
            for r in impute(df, "v", "i", ["k"], strat, "f").collect()
        }
        for i, v in enumerate(vals):
            if v is not None:
                assert got[i] == v  # non-null cells untouched
            elif got[i] is not None and strat in ("previous", "next"):
                assert got[i] in observed
            elif got[i] is not None and observed:
                assert min(observed) - 1e-6 <= got[i] <= max(observed) + 1e-6


@given(
    stream=st.lists(
        st.sampled_from([f"k{i}" for i in range(12)]), min_size=1, max_size=400
    ),
    capacity=st.integers(min_value=2, max_value=8),
)
@settings(max_examples=200, deadline=None)
def test_misra_gries_summary_invariants(stream, capacity):
    """Pure-kernel MG properties on arbitrary streams: the summary never
    exceeds capacity, stores only undercounts, and retains every key
    with frequency > n/(capacity+1) (the pigeonhole guarantee the
    distributed exactness proof builds on)."""
    from collections import Counter

    import pandas as pd

    from knime_core_columnar_spark.operators.sketch import _mg_partition

    out = list(_mg_partition(iter([pd.DataFrame({"__key": stream})]), capacity))[0]
    got = dict(zip(out["__key"], out["__undercount"]))
    true = Counter(stream)
    assert len(got) <= capacity
    n = len(stream)
    for k, v in got.items():
        assert v <= true[k]  # undercount, never overcount
        assert true[k] - v <= n // (capacity + 1) + 1  # bounded loss
    for k, c in true.items():
        if c > n / (capacity + 1):
            assert k in got, f"heavy key {k} ({c}/{n}) evicted"


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=0,
        max_size=25,
    )
)
def test_triangle_counts_match_bruteforce(spark_session, edges):
    """Random small graphs: the degree-oriented distributed count equals
    a brute-force enumeration over the cleaned undirected edge set."""
    from itertools import combinations

    from knime_core_columnar_spark.operators.graph import triangle_counts

    clean = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({x for e in clean for x in e})
    want = {v: 0 for v in nodes}
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= clean:
            want[a] += 1
            want[b] += 1
            want[c] += 1
    df = spark_session.createDataFrame(
        list(clean) or [(0, 0)], "src long, dst long"
    )
    got = {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }
    assert got == want


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(
    parts=st.lists(
        st.sampled_from(
            # last token = block; names engineered so some cross-name
            # pairs verify (lev<=2) and some miss on the length gap
            ["red apple", "ted apple", "tedd apple", "navy zzzz apple",
             "blue rock", "blue sock", "bluee rock"]
        ),
        min_size=1, max_size=14,
    )
)
@settings(max_examples=10, deadline=None)
def test_fuzzy_match_counts_match_record_bruteforce(
    spark_session, tmp_path_factory, parts
):
    """DIFFERENTIAL: the name-collapsed fuzzy_match_names must equal a
    record-level brute force (all within-block pairs, python
    Levenshtein) on arbitrary multiplicity mixes — the clique/cross/
    neighbor-max reconstruction has to survive every combination of
    duplicated and unique names."""
    from knime_core_columnar_spark import catalog

    rows = [(i + 1, name) for i, name in enumerate(parts)]
    # brute force at record level
    import collections

    by_block = collections.defaultdict(list)
    for pid, name in rows:
        by_block[name.rsplit(" ", 1)[-1]].append((pid, name))
    expect = {}
    for blk, members in by_block.items():
        n_pairs, lefts = 0, set()
        for i in range(len(members)):
            for j in range(len(members)):
                (ia, na), (ib, nb) = members[i], members[j]
                if ia < ib and _lev(na, nb) <= 2:
                    n_pairs += 1
                    lefts.add(ia)
        if n_pairs:
            expect[blk] = (n_pairs, len(lefts))

    d = tmp_path_factory.mktemp("fuzzy")
    spark_session.createDataFrame(
        rows, "p_partkey long, p_name string"
    ).write.mode("overwrite").parquet(f"{d}/part.parquet")
    got = {
        r["block"]: (r["n_pairs"], r["n_left"])
        for r in catalog.QUERIES["fuzzy_match_names"](
            spark_session, str(d)
        ).collect()
    }
    assert got == expect
