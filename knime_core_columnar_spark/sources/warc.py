"""WARC (Web ARChive, ISO 28500) read/write — the container format of
Common Crawl and every web-crawl corpus: a .warc.gz file is a
concatenation of GZIP MEMBERS, one member per record, each record a
header block (``WARC/1.0`` + name: value lines + Content-Length) and a
payload. Member-per-record gzip is the load-bearing convention: a
reader can seek to any record boundary and decompress just that
member, and a splitter can fan records out without decompressing the
whole file.

Spark-first design (the webdataset.py companion):
- files are the unit of parallelism: a crawl segment is thousands of
  .warc.gz files, read as ``binaryFile`` rows and parsed executor-side
  with stdlib zlib/gzip (no environment gate) — 10k files → 10k-way
  parallelism, no driver involvement;
- the writer assigns records to files by the repo's md5-prefix key
  convention (partitioning-independent, SQL-replayable) and emits
  deterministic bytes: fixed WARC-Date, md5-derived record ids, records
  sorted by key, gzip mtime=0 — re-exports are byte-identical;
- only the honest subset is implemented: ``warcinfo``-free files of
  ``response``-type records with a plain payload (no nested HTTP
  block); Content-Length framing and multi-member gzip ARE the real
  format, so real .warc.gz files whose records use these mechanics
  parse with the same reader.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_warc", "read_warc", "warc_file_of"]

_WARC_DATE = "2024-01-01T00:00:00Z"


def warc_file_of(key_col, n_files: int):
    """Deterministic file id for a record key (md5-prefix convention —
    replayable in DuckDB as ('0x' || substring(md5(k), 1, 15)) %%
    n_files)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % n_files
    ).cast("int")


def _record_bytes(url: str, content: bytes) -> bytes:
    rid = hashlib.md5(url.encode("utf-8")).hexdigest()
    hdr = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid[:8]}-{rid[8:12]}-{rid[12:16]}-"
        f"{rid[16:20]}-{rid[20:32]}>\r\n"
        f"WARC-Date: {_WARC_DATE}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(content)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return hdr + content + b"\r\n\r\n"


def write_warc(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    content_col: str = "text",
    key_col: str | None = None,
    n_files: int = 8,
) -> None:
    """Export (url, content) rows as ``out_dir/part-NNNNN.warc.gz``:
    one gzip member per record (the Common Crawl convention), records
    sorted by url within a file, zeroed gzip mtime — byte-reproducible
    at any input partitioning. Each file is written by exactly one
    task (groupBy(file) → applyInPandas)."""
    key_col = key_col or url_col
    os.makedirs(out_dir, exist_ok=True)

    def _write_file(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["__file"].iloc[0])
        recs = []
        for _, row in pdf.iterrows():
            content = row[content_col]
            content = (b"" if content is None
                       else content.encode("utf-8")
                       if isinstance(content, str) else bytes(content))
            recs.append((str(row[url_col]), content))
        recs.sort(key=lambda r: r[0])
        buf = io.BytesIO()
        for url, content in recs:
            member = io.BytesIO()
            with gzip.GzipFile(fileobj=member, mode="wb", mtime=0) as gz:
                gz.write(_record_bytes(url, content))
            buf.write(member.getvalue())
        path = os.path.join(out_dir, f"part-{fid:05d}.warc.gz")
        tmp = f"{path}.part{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        os.replace(tmp, path)
        return pd.DataFrame({"file": [fid], "n_records": [len(recs)]})

    cols = list(dict.fromkeys([url_col, content_col, key_col]))
    (
        df.select(*cols)
        .withColumn("__file", warc_file_of(key_col, n_files))
        .groupBy("__file")
        .applyInPandas(_write_file, "file int, n_records long")
        .collect()
    )


def _split_gzip_members(raw: bytes):
    """Yield decompressed gzip members from a multi-member stream."""
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(31)
        out = d.decompress(raw[pos:])
        yield out
        consumed = len(raw) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed


def _parse_records(data: bytes):
    """Parse concatenated WARC records from one decompressed blob
    (Content-Length framing per ISO 28500)."""
    pos = 0
    while True:
        end = data.find(b"\r\n\r\n", pos)
        if end < 0:
            break
        headers = {}
        lines = data[pos:end].decode("utf-8", "replace").split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            break
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        n = int(headers.get("content-length", "0"))
        body = data[end + 4:end + 4 + n]
        yield headers, body
        pos = end + 4 + n + 4  # skip the record-terminating \r\n\r\n


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of .warc.gz (or plain .warc) files as
    (file, url, warc_type, record_id, content) rows — binaryFile scan,
    stdlib decode executor-side."""
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fs, us, ts, ids, cs = [], [], [], [], []
            for _, row in pdf.iterrows():
                raw = bytes(row["content"])
                name = os.path.basename(row["path"])
                if name.endswith(".gz"):
                    blobs = _split_gzip_members(raw)
                else:
                    blobs = [raw]
                for blob in blobs:
                    for headers, body in _parse_records(blob):
                        fs.append(name)
                        us.append(headers.get("warc-target-uri"))
                        ts.append(headers.get("warc-type"))
                        ids.append(headers.get("warc-record-id"))
                        cs.append(body)
            yield pd.DataFrame({
                "file": fs, "url": us, "warc_type": ts,
                "record_id": ids, "content": cs,
            })

    return files.mapInPandas(
        _decode,
        "file string, url string, warc_type string, record_id string, "
        "content binary",
    )
