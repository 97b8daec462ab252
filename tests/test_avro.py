"""Pure-Python Avro container source/sink (sources/avro.py).

Three layers of evidence, because a self-consistent encoder+decoder can
be wrong together:
1. a byte-level golden fixture hand-assembled from the PUBLIC Avro 1.11
   spec (zigzag varints, metadata map, sync-marker-delimited deflate
   block) that the decoder must read and the encoder must reproduce;
2. Spark roundtrips (driver tier + distributed binaryFile tier) over
   every supported logical/complex type;
3. the io.read_avro fallback path (jar absent in this container).
"""

import datetime
import json
import struct
import zlib
from decimal import Decimal

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from knime_core_columnar_spark.sources import avro as A
from knime_core_columnar_spark.sources.io import read_avro


# ---------------------------------------------------------------------------
# layer 1: spec-level golden bytes (no Spark)
# ---------------------------------------------------------------------------

def _zigzag(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n >= 0 else (((-n) << 1) - 1)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _golden_file(codec: str = "null") -> tuple[bytes, dict]:
    """Hand-assemble a 2-row container per the spec (not via our encoder).

    record {id: long, name: string, score: double, tag: [null, string]}
    rows: (1, "a", 1.5, None), (-2, "bc", -0.25, "x")
    """
    schema = {
        "type": "record",
        "name": "golden",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": "double"},
            {"name": "tag", "type": ["null", "string"]},
        ],
    }
    sync = bytes(range(16))
    body = bytearray()
    # row 1: id=1, name="a", score=1.5, tag=null (union branch 0)
    body += _zigzag(1) + _zigzag(1) + b"a" + struct.pack("<d", 1.5) + _zigzag(0)
    # row 2: id=-2, name="bc", score=-0.25, tag="x" (union branch 1)
    body += (
        _zigzag(-2) + _zigzag(2) + b"bc" + struct.pack("<d", -0.25)
        + _zigzag(1) + _zigzag(1) + b"x"
    )
    data = bytes(body)
    if codec == "deflate":
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        data = comp.compress(data) + comp.flush()

    out = bytearray(b"Obj\x01")
    sj = json.dumps(schema).encode()
    out += _zigzag(2)
    out += _zigzag(len(b"avro.schema")) + b"avro.schema"
    out += _zigzag(len(sj)) + sj
    out += _zigzag(len(b"avro.codec")) + b"avro.codec"
    out += _zigzag(len(codec.encode())) + codec.encode()
    out += _zigzag(0)
    out += sync
    out += _zigzag(2) + _zigzag(len(data)) + data + sync
    return bytes(out), schema


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_decoder_reads_spec_golden_bytes(codec):
    raw, _schema = _golden_file(codec)
    st, rows = A._decode_file(raw)
    assert [f.name for f in st.fields] == ["id", "name", "score", "tag"]
    assert isinstance(st["id"].dataType, T.LongType)
    assert st["tag"].nullable and not st["id"].nullable
    assert rows == [(1, "a", 1.5, None), (-2, "bc", -0.25, "x")]


def test_encoder_reproduces_spec_block_bytes():
    """Encode the golden rows with our writer and compare the DATA BLOCK
    byte-for-byte with the hand-assembled spec bytes (header differs only
    in schema-json key order / sync marker, so compare the block body)."""
    st = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), False),
            T.StructField("score", T.DoubleType(), False),
            T.StructField("tag", T.StringType(), True),
        ]
    )
    sync = bytes(range(16))
    encoded = A.encode_container(
        st,
        [(1, "a", 1.5, None), (-2, "bc", -0.25, "x")],
        codec="null",
        sync=sync,
    )
    golden, _ = _golden_file("null")
    # both files end with: count, size, body, sync — body must match
    expected_body = (
        _zigzag(1) + _zigzag(1) + b"a" + struct.pack("<d", 1.5) + _zigzag(0)
        + _zigzag(-2) + _zigzag(2) + b"bc" + struct.pack("<d", -0.25)
        + _zigzag(1) + _zigzag(1) + b"x"
    )
    tail = _zigzag(2) + _zigzag(len(expected_body)) + expected_body + sync
    assert encoded.endswith(tail)
    assert golden.endswith(tail)
    # and our decoder accepts our encoder's full file
    _st, rows = A._decode_file(encoded)
    assert rows == [(1, "a", 1.5, None), (-2, "bc", -0.25, "x")]


def test_zigzag_varint_edge_values():
    for n in [0, 1, -1, 63, 64, -64, -65, 2**31 - 1, -(2**31), 2**62, -(2**63)]:
        out = bytearray()
        A._write_long(out, n)
        assert bytes(out) == _zigzag(n)
        assert A._read_long(A._Cursor(bytes(out))) == n


# ---------------------------------------------------------------------------
# layer 2: Spark roundtrips
# ---------------------------------------------------------------------------

ALL_TYPES_SCHEMA = T.StructType(
    [
        T.StructField("b", T.BooleanType(), True),
        T.StructField("i", T.IntegerType(), True),
        T.StructField("l", T.LongType(), True),
        T.StructField("f", T.FloatType(), True),
        T.StructField("d", T.DoubleType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("bin", T.BinaryType(), True),
        T.StructField("dt", T.DateType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("dec", T.DecimalType(12, 3), True),
        T.StructField("arr", T.ArrayType(T.LongType(), True), True),
        T.StructField("m", T.MapType(T.StringType(), T.DoubleType(), True), True),
        T.StructField(
            "st",
            T.StructType(
                [
                    T.StructField("x", T.LongType(), True),
                    T.StructField("y", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

ALL_TYPES_ROWS = [
    (
        True, 7, 12345678901, 1.5, 2.25, "héllo", b"\x00\x01",
        datetime.date(2024, 2, 29),
        datetime.datetime(2024, 2, 29, 12, 34, 56, 789012),
        Decimal("12345.678"),
        [1, None, 3],
        {"a": 1.5, "b": None},
        (42, "inner"),
    ),
    (None, None, None, None, None, None, None, None, None, None, None, None, None),
    (
        False, -7, -12345678901, -1.5, -2.25, "", b"",
        datetime.date(1969, 12, 31),
        datetime.datetime(1969, 12, 31, 23, 59, 59, 999999),
        Decimal("-0.001"),
        [],
        {},
        (None, None),
    ),
]


def _canon(df):
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: str(t),
    )


def test_all_types_roundtrip_driver_tier(spark, tmp_path):
    df = spark.createDataFrame(ALL_TYPES_ROWS, ALL_TYPES_SCHEMA)
    out = tmp_path / "all_types"
    paths = A.write_avro(df.coalesce(1), str(out), codec="deflate")
    assert len(paths) == 1
    t = A.read_avro_py(spark, paths[0], key_columns=["l"])
    back = t.df.drop("_row_key")
    assert back.schema == ALL_TYPES_SCHEMA
    assert _canon(back) == _canon(df)


def test_all_types_roundtrip_distributed_tier(spark, tmp_path):
    df = spark.createDataFrame(ALL_TYPES_ROWS * 10, ALL_TYPES_SCHEMA)
    out = tmp_path / "all_types_dist"
    paths = A.write_avro(df.repartition(3), str(out), codec="deflate")
    assert len(paths) == 3
    t = A.read_avro_py(spark, str(out), key_columns=["l"])  # dir -> distributed
    back = t.df.drop("_row_key")
    assert back.schema == ALL_TYPES_SCHEMA
    assert _canon(back) == _canon(df)


def test_io_read_avro_falls_back_without_jar(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2.5).alias("v"),
        F.concat(F.lit("k"), F.col("id")).alias("k"),
    )
    out = tmp_path / "fallback"
    A.write_avro(df, str(out))
    t = read_avro(spark, str(out), key_columns=["id"])
    assert t.df.count() == 100
    assert _canon(t.df.drop("_row_key")) == _canon(df)


def test_null_codec_and_block_rollover(spark, tmp_path):
    df = spark.range(10000).select("id", (F.col("id") % 7).alias("g"))
    out = tmp_path / "blocks"
    # rows_per_block=1024 forces ~10 blocks per file; null codec path
    A.write_avro(df.coalesce(1), str(out), codec="null", rows_per_block=1024)
    t = A.read_avro_py(spark, str(out), key_columns=["id"])
    got = t.df.agg(
        F.count("*").alias("n"), F.sum("id").alias("s")
    ).collect()[0]
    assert (got["n"], got["s"]) == (10000, 10000 * 9999 // 2)


def test_enum_and_fixed_decode(spark):
    """Types only the READ side needs (we never write them): enum -> string,
    fixed -> binary, [int,long] union -> long."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "e", "type": {"type": "enum", "name": "E",
                                   "symbols": ["RED", "GREEN", "BLUE"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "FX", "size": 3}},
            {"name": "il", "type": ["int", "long"]},
        ],
    }
    sync = b"\x01" * 16
    body = (
        _zigzag(1) + b"abc" + _zigzag(1) + _zigzag(5)      # GREEN, b"abc", int 5
        + _zigzag(2) + b"xyz" + _zigzag(0) + _zigzag(2**40)  # BLUE, b"xyz", long
    )
    sj = json.dumps(schema).encode()
    raw = bytearray(b"Obj\x01")
    raw += _zigzag(2)
    raw += _zigzag(11) + b"avro.schema" + _zigzag(len(sj)) + sj
    raw += _zigzag(10) + b"avro.codec" + _zigzag(4) + b"null"
    raw += _zigzag(0) + sync
    raw += _zigzag(2) + _zigzag(len(body)) + body + sync
    st, rows = A._decode_file(bytes(raw))
    assert isinstance(st["e"].dataType, T.StringType)
    assert isinstance(st["fx"].dataType, T.BinaryType)
    assert isinstance(st["il"].dataType, T.LongType)
    assert rows == [("GREEN", b"abc", 5), ("BLUE", b"xyz", 2**40)]


def test_unsupported_union_raises():
    with pytest.raises(NotImplementedError, match="complex avro union"):
        A._compile_reader(["string", "long"], {})


def test_snappy_codec_raises_clearly():
    raw, _ = _golden_file("null")
    # rewrite the codec in the metadata map by rebuilding the header
    raw2, _ = _golden_file("deflate")
    assert A._decode_file(raw2)[1]  # deflate fine
    with pytest.raises(NotImplementedError, match="snappy"):
        A._decompress(b"\x00", "snappy")


def test_deflate_actually_compresses(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "the same repetitive payload " * 10) for i in range(2000)],
        "id long, payload string",
    )
    d1 = tmp_path / "plain"
    d2 = tmp_path / "deflate"
    (p1,) = A.write_avro(df.coalesce(1), str(d1), codec="null")
    (p2,) = A.write_avro(df.coalesce(1), str(d2), codec="deflate")
    import os

    assert os.path.getsize(p2) < os.path.getsize(p1) / 5


# ---------------------------------------------------------------------------
# layer 3: property-based codec roundtrip (pure Python, no Spark)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as hs

_prop_schema = T.StructType(
    [
        T.StructField("l", T.LongType(), True),
        T.StructField("d", T.DoubleType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("bin", T.BinaryType(), True),
        T.StructField("arr", T.ArrayType(T.LongType(), True), True),
        T.StructField("m", T.MapType(T.StringType(), T.LongType(), True), True),
    ]
)

_row_st = hs.tuples(
    hs.one_of(hs.none(), hs.integers(min_value=-(2**63), max_value=2**63 - 1)),
    hs.one_of(hs.none(), hs.floats(allow_nan=False, width=64)),
    hs.one_of(hs.none(), hs.text(max_size=40)),
    hs.one_of(hs.none(), hs.binary(max_size=40)),
    hs.one_of(
        hs.none(),
        hs.lists(
            hs.one_of(hs.none(), hs.integers(min_value=-(2**31), max_value=2**31)),
            max_size=8,
        ),
    ),
    hs.one_of(
        hs.none(),
        hs.dictionaries(
            hs.text(max_size=10),
            hs.one_of(hs.none(), hs.integers(min_value=0, max_value=2**40)),
            max_size=5,
        ),
    ),
)


@settings(max_examples=200, deadline=None)
@given(rows=hs.lists(_row_st, max_size=25), codec=hs.sampled_from(["null", "deflate"]))
def test_codec_roundtrip_property(rows, codec):
    """encode -> decode is the identity on arbitrary rows (incl. nulls at
    every nesting level, ±2^63 longs, unicode, empty containers)."""
    data = A.encode_container(_prop_schema, rows, codec=codec, rows_per_block=7)
    st, got = A._decode_file(data)
    assert st == _prop_schema
    assert got == [tuple(r) for r in rows]
