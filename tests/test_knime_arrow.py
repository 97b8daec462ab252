"""KNIME Arrow interop against the reference's own golden files
(org.knime.core.columnar.arrow.tests/test_data/ZonedDateTime_legacy_files)."""

import os

import pytest

from knime_core_columnar_spark.sources.knime_arrow import (
    KNIME_CHUNK_SIZE_KEY,
    KNIME_FACTORY_VERSIONS_KEY,
    read_knime_arrow,
    read_knime_metadata,
)

GOLDEN = "/root/reference/org.knime.core.columnar.arrow.tests/test_data"
ZDT = f"{GOLDEN}/ZonedDateTime_legacy_files"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ZDT), reason="reference golden files not present"
)


def test_footer_metadata():
    meta = read_knime_metadata(f"{ZDT}/single_batch.arrow")
    assert meta[KNIME_CHUNK_SIZE_KEY] == "20"
    assert meta[KNIME_FACTORY_VERSIONS_KEY] == "0"


def test_single_batch_mapping(spark):
    t = read_knime_arrow(spark, f"{ZDT}/single_batch.arrow")
    assert t.knime_metadata[KNIME_CHUNK_SIZE_KEY] == "20"
    f = next(f for f in t.df.schema.fields if f.name == "0")
    assert f.metadata.get("knime.logical_type") == "ZonedDateTime"
    assert f.metadata.get("knime.legacy") is True
    assert f.metadata.get("knime.factory_version") == "0"
    rows = t.df.select("0").collect()
    assert len(rows) == 20
    vals = [r["0"] for r in rows if r["0"] is not None]
    assert vals, "expected non-null ZonedDateTime values"
    # zoneId length-prefix decoded to a real zone string
    assert any(v["zone_id"] == "Pacific/Truk" for v in vals)
    assert all(isinstance(v["zone_id"], str) and len(v["zone_id"]) > 0 for v in vals)
    # nanosecond precision survived (raw value has a non-µs tail)
    assert any(v["nano_of_day"] % 1000 != 0 for v in vals)
    assert any(v["nano_of_day"] == 25576982112925 for v in vals)


def test_multiple_batches_dictionary_replacement(spark):
    # KNIME writes a fresh dictionary per batch — the pyarrow FILE reader
    # rejects this; the embedded-stream read must still get all rows.
    t = read_knime_arrow(spark, f"{ZDT}/multiple_batches.arrow")
    assert t.df.count() == 60


def test_multiple_columns(spark):
    t = read_knime_arrow(spark, f"{ZDT}/multiple_columns.arrow")
    assert t.df.count() == 60
    data_cols = [f for f in t.df.schema.fields if f.name in {"0", "1", "2"}]
    assert len(data_cols) == 3
    assert all(f.metadata.get("knime.logical_type") == "ZonedDateTime" for f in data_cols)


def test_struct_list_nested(spark):
    from pyspark.sql import types as T

    t = read_knime_arrow(spark, f"{ZDT}/struct_list.arrow")
    assert t.df.count() == 60
    outer = next(f for f in t.df.schema.fields if f.name == "0")
    assert isinstance(outer.dataType, T.StructType)
    inner = {f.name: f.dataType for f in outer.dataType.fields}
    assert isinstance(inner["0"], T.StructType)  # nested ZDT struct
    assert isinstance(inner["2"], T.ArrayType)  # list<ZDT>
    assert isinstance(inner["2"].elementType, T.StructType)
    # a nested list element decodes end-to-end
    row = next(
        r["0"] for r in t.df.select("0").collect()
        if r["0"] is not None and r["0"]["2"]
    )
    elem = row["2"][0]
    assert elem is None or isinstance(elem["zone_id"], (str, type(None)))


def test_write_read_roundtrip_with_envelope(spark, tmp_path):
    from knime_core_columnar_spark.sources.knime_arrow import write_knime_arrow
    from knime_core_columnar_spark.table import ColumnarTable

    t = ColumnarTable(
        spark.createDataFrame(
            [(f"Row{i}", i, f"s{i}") for i in range(50)],
            "_row_key string, n long, s string",
        )
    )
    path = str(tmp_path / "envelope.arrow")
    assert write_knime_arrow(t, path, chunk_size=20) == 50
    meta = read_knime_metadata(path)
    assert meta[KNIME_CHUNK_SIZE_KEY] == "20"
    assert meta[KNIME_FACTORY_VERSIONS_KEY] == "0,0,0"
    back = read_knime_arrow(spark, path)
    assert back.knime_metadata[KNIME_CHUNK_SIZE_KEY] == "20"
    got = {r["_row_key"]: (r["n"], r["s"]) for r in back.df.collect()}
    assert got == {f"Row{i}": (i, f"s{i}") for i in range(50)}
    # batch geometry honored (50 rows / 20-chunk -> 3 record batches)
    import pyarrow as pa
    import pyarrow.ipc

    with pa.memory_map(path) as src:
        assert pa.ipc.open_file(src).num_record_batches == 3


def test_write_lz4_frame_compressed_roundtrip(spark, tmp_path):
    """Default write is LZ4-frame body-compressed Arrow IPC — the
    reference's own write codec (Lz4FrameCompressionCodec.java, default
    in ArrowColumnStoreFactory.java:98-112). The compressed file must
    round-trip value-exactly AND be materially smaller than the
    uncompressed form on compressible data."""
    from knime_core_columnar_spark.sources.knime_arrow import write_knime_arrow
    from knime_core_columnar_spark.table import ColumnarTable

    t = ColumnarTable(
        spark.createDataFrame(
            [(f"Row{i}", i, "the quick brown fox " * 20) for i in range(400)],
            "_row_key string, n long, s string",
        )
    )
    lz4_path = str(tmp_path / "compressed.arrow")
    raw_path = str(tmp_path / "uncompressed.arrow")
    # dict_encode=False isolates the CODEC's effect: with dict encoding
    # on (the default), the repeated strings are already deduplicated
    # before compression and the 3x ratio would be unmeasurable
    assert write_knime_arrow(
        t, lz4_path, chunk_size=100, dict_encode=False
    ) == 400
    assert write_knime_arrow(
        t, raw_path, chunk_size=100, compression=None, dict_encode=False
    ) == 400

    import os

    import pyarrow as pa
    import pyarrow.ipc

    assert os.path.getsize(lz4_path) < os.path.getsize(raw_path) / 3
    # standard Arrow body compression: stock pyarrow reads it unaided
    with pa.memory_map(lz4_path) as src:
        rd = pa.ipc.open_file(src)
        assert rd.num_record_batches == 4
    for path in (lz4_path, raw_path):
        back = read_knime_arrow(spark, path)
        assert back.knime_metadata[KNIME_CHUNK_SIZE_KEY] == "100"
        got = {r["_row_key"]: (r["n"], r["s"]) for r in back.df.collect()}
        assert got == {
            f"Row{i}": (i, "the quick brown fox " * 20) for i in range(400)
        }


def test_write_dict_encoded_roundtrip_and_layout(spark, tmp_path):
    """Default write struct-dict-encodes String/VarBinary data columns
    per batch (DefaultColumnarBatchStore.java:282-287): on-disk layout
    is struct<"0" uint64, "1" value> with the knime.struct_dict_encoded
    extension tag, keys ascend in first-appearance order and RESTART
    each batch, each entry materializes once, RowID stays plain — and
    the file round-trips value-exactly through read_knime_arrow."""
    import pyarrow as pa
    import pyarrow.ipc

    from knime_core_columnar_spark.sources.knime_arrow import write_knime_arrow
    from knime_core_columnar_spark.table import ColumnarTable

    colors = ["red", "green", "blue"]
    rows = [
        (f"Row{i}", colors[i % 3] if i % 7 else None, i) for i in range(120)
    ]
    t = ColumnarTable(
        spark.createDataFrame(rows, "_row_key string, c string, n long")
    )
    path = str(tmp_path / "dictenc.arrow")
    assert write_knime_arrow(t, path, chunk_size=40, compression=None) == 120

    with pa.memory_map(path) as src:
        rd = pa.ipc.open_file(src)
        sch = rd.schema
        f_c = sch.field("c")
        assert pa.types.is_struct(f_c.type)
        assert f_c.type.field(0).name == "0"
        assert f_c.type.field(0).type == pa.uint64()
        assert f_c.type.field(1).type == pa.string()
        assert (f_c.metadata or {})[b"ARROW:extension:name"] == (
            b"knime.struct_dict_encoded"
        )
        # RowID column NOT dict-encoded
        assert pa.types.is_string(sch.field("_row_key").type) or (
            pa.types.is_large_string(sch.field("_row_key").type)
        )
        assert rd.num_record_batches == 3
        b0 = rd.get_batch(0).column(sch.get_field_index("c"))
        # per-batch dictionary: each batch's keys start at 0 and every
        # entry appears exactly once
        ent = [v for v in b0.field(1).to_pylist() if v is not None]
        assert sorted(ent) == sorted(set(ent))
        keys0 = [v for v in b0.field(0).to_pylist() if v is not None]
        assert min(keys0) == 0
        b2 = rd.get_batch(2).column(sch.get_field_index("c"))
        keys2 = [v for v in b2.field(0).to_pylist() if v is not None]
        assert min(keys2) == 0  # keys restart per batch

    back = read_knime_arrow(spark, path)
    got = {r["_row_key"]: (r["c"], r["n"]) for r in back.df.collect()}
    assert got == {k: (c, n) for k, c, n in rows}
    # opting out writes plain columns
    plain = str(tmp_path / "plain.arrow")
    write_knime_arrow(t, plain, chunk_size=40, compression=None,
                      dict_encode=False)
    with pa.memory_map(plain) as src:
        sch = pa.ipc.open_file(src).schema
        assert not pa.types.is_struct(sch.field("c").type)


def test_lz4_block_golden_values(spark):
    """Value-exact read of the reference's LZ4-*block* golden file. The
    expected content is fully specified by the reference's own test
    (Lz4BlockCompressionLegacyTest.java:159-215): 3 batches x 20 rows,
    int col = i % (10*(seed+1)) with every 7th missing, string col =
    STRINGS[(i+seed) % 5] with every 13th missing."""
    t = read_knime_arrow(spark, f"{GOLDEN}/LZ4_block_compression/data.arrow")
    assert t.knime_metadata["KNIME:basic:usingLz4Block"] == "true"
    rows = t.df.orderBy("_row_key").collect()
    assert len(rows) == 60
    strings = ["foo", "bar", "car", "aaa", "bbb"]
    by_key = {r["_row_key"]: (r["0"], r["1"]) for r in rows}
    for seed in range(3):
        for i in range(20):
            got_int, got_str = by_key[f"Row{seed * 20 + i}"]
            assert got_int == (None if i % 7 == 0 else i % (10 * (seed + 1)))
            assert got_str == (None if i % 13 == 0 else strings[(i + seed) % 5])


def test_lz4_block_zdt_compressed(spark):
    """ZDT/compressed.arrow uses the same legacy LZ4-block codec over
    ZonedDateTime structs — decode end-to-end incl. dictionary zoneId."""
    t = read_knime_arrow(spark, f"{ZDT}/compressed.arrow")
    n = t.df.count()
    assert n > 0
    vals = [r["0"] for r in t.df.select("0").collect() if r["0"] is not None]
    assert vals
    assert all(isinstance(v["zone_id"], str) and v["zone_id"] for v in vals)


def test_struct_dict_encoded_decode(spark, tmp_path):
    """knime.struct_dict_encoded columns decode to logical values: the
    storage struct<dictKey uint32, dictEntry string> materializes each
    entry only at the FIRST row of its key; later rows reference it
    (AbstractOnHeapArrowDictEncodedData.java:290, getString:144-149;
    layout per StructDictEncodedExtensionType.java:90-111)."""
    import pyarrow as pa
    import pyarrow.ipc

    keys = [0, 1, 0, 2, 1, 0, None, 2]
    entries = ["red", "green", None, "blue", None, None, None, None]
    expect = ["red", "green", "red", "blue", "green", "red", None, "blue"]
    storage = pa.StructArray.from_arrays(
        [pa.array(keys, pa.uint32()), pa.array(entries, pa.string())],
        names=["dictKey", "dictEntry"],
        mask=pa.array([k is None for k in keys]),
    )
    field = pa.field(
        "0",
        storage.type,
        metadata={
            b"ARROW:extension:name": b"knime.struct_dict_encoded",
            b"ARROW:extension:metadata": b"",
        },
    )
    schema = pa.schema([field]).with_metadata(
        {KNIME_CHUNK_SIZE_KEY: "8", KNIME_FACTORY_VERSIONS_KEY: "0"}
    )
    path = str(tmp_path / "structdict.arrow")
    with pa.OSFile(path, "wb") as sink:
        with pa.ipc.new_file(sink, schema) as writer:
            writer.write_batch(pa.record_batch([storage], schema=schema))
    t = read_knime_arrow(spark, path)
    f = next(f for f in t.df.schema.fields if f.name == "0")
    assert f.metadata.get("knime.struct_dict_encoded") is True
    got = [r["0"] for r in t.df.orderBy("_row_key").collect()]
    # RowN sort is lexicographic for N<10 with 8 rows — order preserved
    assert got == expect
