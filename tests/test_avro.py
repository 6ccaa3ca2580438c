"""Avro OCF source/sink (r15) — engine codec validated BOTH ways
against the independent reference codec in tests/avro_ref.py:
engine reader on reference-encoded bytes, engine writer under the
reference decoder. Never the engine against itself alone."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from datamancer_spark.frame import DamFrame
from datamancer_spark.io import read_avro, write_avro

import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from avro_ref import ref_read_ocf, ref_write_ocf  # noqa: E402

SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "txt", "type": ["null", "string"]},
        {"name": "price", "type": ["null", "double"]},
        {"name": "flag", "type": "boolean"},
    ],
}

EDGE_ROWS = [
    {"k": 0, "txt": "", "price": 0.0, "flag": False},
    {"k": -1, "txt": "a,b\ncd", "price": -1.5, "flag": True},
    {"k": 2**62, "txt": "héllo ✓ 漢字", "price": 1e300, "flag": True},
    {"k": -(2**62), "txt": None, "price": None, "flag": False},
    {"k": 7, "txt": "nan row", "price": float("nan"), "flag": True},
    {"k": 8, "txt": "inf row", "price": float("inf"), "flag": False},
    {"k": 9, "txt": "-inf", "price": float("-inf"), "flag": True},
    {"k": 127, "txt": "varint boundary", "price": 127.0, "flag": False},
    {"k": 128, "txt": "varint boundary 2", "price": 128.0, "flag": True},
]


def _same(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    return a == b


class TestEngineReaderOnReferenceBytes:
    @pytest.mark.parametrize("codec", ["null", "deflate"])
    def test_edge_values_exact(self, spark, tmp_path, codec):
        d = str(tmp_path / f"ref_{codec}")
        os.makedirs(d)
        ref_write_ocf(f"{d}/part-00000.avro", SCHEMA, EDGE_ROWS, codec)
        got = sorted(
            read_avro(spark, d).df.collect(), key=lambda r: r["k"]
        )
        want = sorted(EDGE_ROWS, key=lambda r: r["k"])
        assert len(got) == len(want)
        for g, w in zip(got, want):
            for f in ("k", "txt", "price", "flag"):
                assert _same(g[f], w[f]), (f, g[f], w[f])

    def test_multi_block_multi_file(self, spark, tmp_path):
        d = str(tmp_path / "ref_multi")
        os.makedirs(d)
        rows = [
            {"k": i, "txt": f"t{i}", "price": i / 8, "flag": i % 2 == 0}
            for i in range(1000)
        ]
        ref_write_ocf(
            f"{d}/part-00000.avro", SCHEMA, rows[:600], "deflate",
            rows_per_block=100,
        )
        ref_write_ocf(
            f"{d}/part-00001.avro", SCHEMA, rows[600:], "null",
            rows_per_block=37,
        )
        back = read_avro(spark, d).df
        assert back.count() == 1000
        assert back.agg(F.sum("k")).first()[0] == sum(r["k"] for r in rows)

    def test_corrupt_sync_is_loud(self, spark, tmp_path):
        d = str(tmp_path / "ref_torn")
        os.makedirs(d)
        p = f"{d}/part-00000.avro"
        ref_write_ocf(p, SCHEMA, EDGE_ROWS, "null")
        blob = bytearray(open(p, "rb").read())
        blob[-1] ^= 0xFF  # flip a byte of the trailing sync marker
        open(p, "wb").write(bytes(blob))
        with pytest.raises(Exception, match="sync"):
            read_avro(spark, d).df.collect()


class TestEngineWriterUnderReferenceDecoder:
    def test_roundtrip_through_reference(self, spark, tmp_path):
        d = str(tmp_path / "eng_out")
        src = spark.createDataFrame(
            [
                (1, "a", 1.25, True),
                (2, None, None, False),
                (3, "é✓", float("nan"), True),
                (-(2**40), "neg", -0.0, False),
            ],
            "k long, txt string, price double, flag boolean",
        )
        write_avro(DamFrame(src), d, codec="deflate")
        files = sorted(
            f for f in os.listdir(d) if f.endswith(".avro")
        )
        assert files, "writer produced no part files"
        rows = []
        for f in files:
            schema, rs = ref_read_ocf(os.path.join(d, f))
            assert [x["name"] for x in schema["fields"]] == [
                "k", "txt", "price", "flag",
            ]
            rows += rs
        rows.sort(key=lambda r: r["k"])
        want = sorted(
            ({"k": r["k"], "txt": r["txt"], "price": r["price"],
              "flag": r["flag"]} for r in src.collect()),
            key=lambda r: r["k"],
        )
        assert len(rows) == 4
        for g, w in zip(rows, want):
            for f in ("k", "txt", "price", "flag"):
                assert _same(g[f], w[f]), (f, g[f], w[f])

    def test_empty_frame_roundtrips_schema(self, spark, tmp_path):
        d = str(tmp_path / "eng_empty")
        src = spark.createDataFrame([], "k long, txt string")
        write_avro(DamFrame(src), d, codec="null")
        back = read_avro(spark, d).df
        assert back.columns == ["k", "txt"]
        assert back.count() == 0

    def test_unsupported_type_is_loud(self, spark, tmp_path):
        src = spark.createDataFrame([([1, 2],)], "arr array<long>")
        with pytest.raises(ValueError, match="arr"):
            write_avro(DamFrame(src), str(tmp_path / "x"))


class TestEngineRoundtripOnTestdata:
    def test_orders_slice_roundtrip(self, spark, sf_dir, tmp_path):
        d = str(tmp_path / "orders_avro")
        src = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select(
                F.col("o_orderkey").cast("long").alias("k"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").cast("double").alias("price"),
            )
            .filter(F.col("k") % 10 == 0)
        )
        write_avro(DamFrame(src), d)
        back = read_avro(spark, d).df
        a = src.agg(
            F.count(F.lit(1)), F.sum("k"),
            F.sum(F.floor(F.col("price") * 100 + F.lit(0.5))),
        ).first()
        b = back.agg(
            F.count(F.lit(1)), F.sum("k"),
            F.sum(F.floor(F.col("price") * 100 + F.lit(0.5))),
        ).first()
        assert tuple(a) == tuple(b)
        # explicit-schema read path (production, no driver peek)
        back2 = read_avro(
            spark, d, schema="k long, status string, price double"
        ).df
        assert back2.count() == a[0]
