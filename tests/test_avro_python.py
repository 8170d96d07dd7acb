"""Pure-Python Avro container IO (sources/avro_python.py): spec-level
golden bytes, container round-trips for every reference parity schema
S1-S5 (SURVEY.md §1.2), and the distributed Spark read/write path."""

from __future__ import annotations

import json

from skripsi_mapreduce_spark import schemas
from skripsi_mapreduce_spark.io import write_avro
from skripsi_mapreduce_spark.sources.avro_python import (
    MAGIC,
    _dec_long,
    _enc_long,
    avro_schema_for,
    read_avro_python,
    read_container,
    spark_schema_for,
    write_container,
)
from skripsi_mapreduce_spark.sources.readers import read_any


def test_zigzag_varint_golden():
    # hand-derived from the Avro spec's own table
    assert _enc_long(0) == b"\x00"
    assert _enc_long(-1) == b"\x01"
    assert _enc_long(1) == b"\x02"
    assert _enc_long(-2) == b"\x03"
    assert _enc_long(2) == b"\x04"
    assert _enc_long(-64) == b"\x7f"
    assert _enc_long(64) == b"\x80\x01"
    for n in (0, 1, -1, 63, -64, 64, 2**40, -(2**40), 2**62, -(2**62)):
        val, pos = _dec_long(_enc_long(n), 0)
        assert val == n and pos == len(_enc_long(n))


def test_record_encoding_golden():
    # {"x": long 1, "s": "ab"} -> x: zigzag(1)=0x02; s: len 2 (0x04) + b"ab"
    sch = json.dumps(
        {
            "type": "record",
            "name": "R",
            "fields": [{"name": "x", "type": "long"}, {"name": "s", "type": "string"}],
        }
    )
    blob = write_container(sch, [{"x": 1, "s": "ab"}], codec="null")
    assert blob[:4] == MAGIC
    # the single block payload is the last 16+payload bytes before sync:
    # find it by re-reading and by raw expectation
    _, recs = read_container(blob)
    assert recs == [{"x": 1, "s": "ab"}]
    assert b"\x02\x04ab" in blob  # the uncompressed record bytes, verbatim


def test_container_roundtrip_all_parity_schemas(spark):
    samples = {
        # S1 ReviewBook
        schemas.REVIEW_BOOK: [
            ("1", "r1", "asin1", "alice", ["good", "fine"], "good fine text"),
            ("2", "r2", "asin2", "bob", [], ""),
        ],
        # S2 DocumentFrequency
        schemas.DOCUMENT_FREQUENCY: [("good", 1.69), ("bad", 2.1)],
        # S4 finalFeature
        schemas.FINAL_FEATURE: [("1", {"good": 0.8, "bad": 0.6}), ("2", {})],
        # S5 intermediate
        schemas.KMEANS_INTERMEDIATE: [(0, [1, 2], {"good": 1.5}, 0.25)],
    }
    for schema, rows in samples.items():
        df = spark.createDataFrame(rows, schema)
        avro_json = avro_schema_for(df.schema)
        # avro<->spark schema mapping is a faithful inverse
        assert [f.name for f in spark_schema_for(avro_json).fields] == df.columns
        for codec in ("null", "deflate"):
            recs = [r.asDict(recursive=True) for r in df.collect()]
            blob = write_container(avro_json, recs, codec=codec)
            got_schema, got = read_container(blob)
            assert json.loads(got_schema) == json.loads(avro_json)
            assert got == recs


def test_spark_distributed_avro_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("1", "r1", "a1", "alice", ["good"], "good text"),
            ("2", "r2", "a2", "bob", ["bad", "sad"], "bad sad text"),
            ("3", "r3", "a3", "carol", [], ""),
        ],
        schemas.REVIEW_BOOK,
    ).repartition(2)
    path = str(tmp_path / "reviews_avro")
    write_avro(df, path)  # falls back to the python codec in this container
    back = read_any(spark, path, "avro")
    assert back.schema == df.schema or [f.name for f in back.schema.fields] == df.columns
    got = sorted((r.asDict(recursive=True) for r in back.collect()), key=lambda r: r["id"])
    want = sorted((r.asDict(recursive=True) for r in df.collect()), key=lambda r: r["id"])
    assert got == want


def test_spark_distributed_map_column_roundtrip(spark, tmp_path):
    """Arrow renders MapType as key/value tuple lists in pandas — the
    writer must still produce avro maps, and the reader dicts."""
    df = spark.createDataFrame(
        [("1", {"good": 0.8, "bad": 0.2}), ("2", {})], schemas.FINAL_FEATURE
    ).repartition(2)
    path = str(tmp_path / "feat_avro")
    write_avro(df, path)
    back = read_any(spark, path, "avro")
    got = sorted((r["id"], dict(r["feature"] or {})) for r in back.collect())
    assert got == [("1", {"good": 0.8, "bad": 0.2}), ("2", {})]


def test_spark_avro_overwrite_semantics(spark, tmp_path):
    path = str(tmp_path / "ow_avro")
    df1 = spark.createDataFrame([("w1", 1.0)], schemas.DOCUMENT_FREQUENCY)
    df2 = spark.createDataFrame([("w2", 2.0), ("w3", 3.0)], schemas.DOCUMENT_FREQUENCY)
    write_avro(df1, path)
    write_avro(df2, path)  # O39: second write replaces the first
    got = sorted(r["word"] for r in read_any(spark, path, "avro").collect())
    assert got == ["w2", "w3"]


def test_nullable_union_roundtrip(spark):
    df = spark.createDataFrame([("a", None), ("b", 2.5)], "k string, v double")
    avro_json = avro_schema_for(df.schema)
    recs = [r.asDict() for r in df.collect()]
    blob = write_container(avro_json, recs, codec="deflate")
    _, got = read_container(blob)
    assert sorted(got, key=lambda r: r["k"]) == sorted(recs, key=lambda r: r["k"])


def test_stream_writer_bounded_blocks_roundtrip(tmp_path):
    """write_container_stream flushes multiple bounded blocks; the reader
    walks them all, and a tiny block size must not change the records."""
    from skripsi_mapreduce_spark.sources.avro_python import (
        read_container,
        write_container,
        write_container_stream,
    )

    schema = (
        '{"type":"record","name":"R","fields":'
        '[{"name":"id","type":"long"},{"name":"s","type":"string"}]}'
    )
    recs = [{"id": i, "s": f"v{i}"} for i in range(1000)]
    p = tmp_path / "blocks.avro"
    with open(p, "wb") as fh:
        n = write_container_stream(schema, iter(recs), fh, "deflate", block_records=64)
    assert n == 1000
    blob = p.read_bytes()
    got_schema, got = read_container(blob)
    assert got == recs
    # >1 data block actually present: the single-block form is shorter
    single = write_container(schema, iter(recs), "deflate")
    assert len(read_container(single)[1]) == 1000
    assert blob != single


def test_pure_snappy_golden_decode():
    """Hand-assembled streams from the public format description decode
    exactly: a plain literal, and a literal + overlapping 1-byte-offset
    copy (the RLE shape)."""
    from skripsi_mapreduce_spark.sources.avro_python import _snappy_decompress_pure

    # varint 5, tag literal len 5 ((5-1)<<2 = 0x10), "hello"
    assert _snappy_decompress_pure(b"\x05\x10hello") == b"hello"
    # varint 8, literal len 1 'a', copy1 len 7 offset 1:
    # tag = ((7-4)<<2)|1 = 0x0D, offset byte 0x01 -> 'a' * 8
    assert _snappy_decompress_pure(b"\x08\x00a\x0d\x01") == b"aaaaaaaa"


def test_pure_snappy_roundtrip_shapes():
    """Round-trip every tag path: empty, short, >60-byte literals,
    overlapping copies, 2-byte and 4-byte offsets (far matches past 64 KiB),
    and incompressible random bytes; repetitive data must actually shrink."""
    import random

    from skripsi_mapreduce_spark.sources.avro_python import (
        _snappy_compress_pure,
        _snappy_decompress_pure,
    )

    rng = random.Random(3)
    rand64k = bytes(rng.randrange(256) for _ in range(70_000))
    cases = [
        b"",
        b"a",
        b"hello",
        b"aaaaaaaaaaaaaaaaaaaaaaaaa",
        b"ab" * 5000,
        bytes(range(256)) * 3,
        b"x" * 61,  # literal needing the 1-extra-length-byte form
        rand64k,  # incompressible
        b"MAGIC" + rand64k + b"MAGIC" + rand64k[:100] + b"MAGIC",  # far offsets
        ("the quick brown fox " * 400).encode(),
    ]
    for data in cases:
        blob = _snappy_compress_pure(data)
        assert _snappy_decompress_pure(blob) == data, f"len={len(data)}"
    # copies chunk at 64 bytes (3-byte tags), so highly repetitive data
    # compresses ~20x: 10000 -> ~480
    assert len(_snappy_compress_pure(b"ab" * 5000)) < 600
    assert len(_snappy_compress_pure(("long text " * 1000).encode())) < 1000


def test_avro_container_snappy_codec_roundtrip():
    """codec='snappy' works without python-snappy (pure fallback): block
    framing = raw snappy + big-endian CRC32 of the uncompressed bytes,
    per the Avro spec."""
    from skripsi_mapreduce_spark.sources.avro_python import (
        read_container,
        write_container,
    )

    schema = (
        '{"type":"record","name":"R","fields":'
        '[{"name":"id","type":"long"},{"name":"s","type":"string"}]}'
    )
    recs = [{"id": i, "s": f"value-{i % 7}"} for i in range(500)]
    blob = write_container(schema, iter(recs), "snappy")
    got_schema, got = read_container(blob)
    assert got == recs
    # corrupting a payload byte must trip the CRC (or the format parse)
    import pytest as _pytest

    bad = bytearray(blob)
    bad[-10] ^= 0xFF
    with _pytest.raises(Exception):
        read_container(bytes(bad))


def test_hadoop_fs_route_file_uri_roundtrip(spark, tmp_path):
    """Schemed URIs route through the JVM Hadoop FileSystem seam
    (r3 verdict #6): write + read via file:// must round-trip, honor
    overwrite semantics, and sniff the schema through the FS API."""
    from skripsi_mapreduce_spark.sources.avro_python import (
        read_avro_python,
        write_avro_python,
    )

    df = spark.createDataFrame(
        [
            ("1", "r1", "a1", "alice", ["good"], "good text"),
            ("2", "r2", "a2", "bob", ["bad", "sad"], "bad sad text"),
        ],
        schemas.REVIEW_BOOK,
    ).repartition(2)
    uri = "file://" + str(tmp_path / "reviews_fs_avro")
    n = write_avro_python(df, uri)
    assert n == 2
    back = read_avro_python(spark, uri)  # schema sniffed via Hadoop FS
    got = sorted((r.asDict(recursive=True) for r in back.collect()), key=lambda r: r["id"])
    want = sorted((r.asDict(recursive=True) for r in df.collect()), key=lambda r: r["id"])
    assert got == want
    # overwrite through FileSystem.delete
    df2 = spark.createDataFrame([("9", "r9", "a9", "zoe", [], "")], schemas.REVIEW_BOOK)
    assert write_avro_python(df2, uri) == 1
    assert [r["id"] for r in read_avro_python(spark, uri).collect()] == ["9"]


def test_avro_py_datasource_round_trip_and_interop(spark, tmp_path):
    """Spark 4 Python DataSource (format 'avro_py') wraps the same codec:
    write via the format, read via the format, and cross-read a
    container written by the classic io.write_avro path."""
    from skripsi_mapreduce_spark.sources.avro_datasource import register

    register(spark)
    df = spark.range(0, 500).selectExpr(
        "id", "CAST(id % 5 AS INT) AS g", "CONCAT('n', id) AS name",
        "CASE WHEN id % 11 = 0 THEN NULL ELSE CAST(id AS DOUBLE) / 7 END AS v",
    )
    out = str(tmp_path / "ds_avro")
    df.repartition(3).write.format("avro_py").option("codec", "snappy").mode(
        "append"
    ).save(out)
    back = spark.read.format("avro_py").load(out)
    assert back.schema == df.schema
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    # interop: classic writer -> datasource reader
    from skripsi_mapreduce_spark.io import write_avro

    classic = str(tmp_path / "classic_avro")
    write_avro(df, classic)
    via_ds = spark.read.format("avro_py").load(classic)
    assert sorted(tuple(r) for r in via_ds.collect()) == sorted(
        tuple(r) for r in df.collect()
    )


def test_avro_py_datasource_overwrite(spark, tmp_path):
    from skripsi_mapreduce_spark.sources.avro_datasource import register

    register(spark)
    out = str(tmp_path / "ow_avro")
    spark.range(0, 10).write.format("avro_py").mode("append").save(out)
    spark.range(100, 105).write.format("avro_py").mode("overwrite").save(out)
    got = sorted(r["id"] for r in spark.read.format("avro_py").load(out).collect())
    assert got == [100, 101, 102, 103, 104]
