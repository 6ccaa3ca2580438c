"""Corpus integrity tier (operators/manifest.py): manifests must be
partitioning-invariant, diffs must localize damage to exactly the
touched shard, and snapshot deltas must classify every key correctly."""

import pytest
from pyspark.sql import functions as F

from datamancer_spark.operators.manifest import (
    manifest_diff,
    shard_manifest,
    snapshot_diff,
)

COLS = ["text", "lang", "source"]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def _manifest_rows(df):
    return sorted(
        tuple(r)
        for r in shard_manifest(df, "doc_id", COLS, n_shards=16).collect()
    )


class TestShardManifest:
    def test_partitioning_and_order_invariant(self, docs):
        """The checksum's load-bearing property: the SAME corpus under a
        different partitioning and row order yields the IDENTICAL
        manifest (a positional checksum would flap here)."""
        base = _manifest_rows(docs)
        scrambled = docs.orderBy(F.reverse(F.col("text"))).repartition(7)
        assert _manifest_rows(scrambled) == base

    def test_every_row_counted_once(self, docs):
        m = shard_manifest(docs, "doc_id", COLS, n_shards=16)
        agg = m.agg(F.sum("n_rows"), F.sum("n_keys")).first()
        n = docs.count()
        assert (agg[0], agg[1]) == (n, n)

    def test_single_row_change_flips_exactly_one_shard(self, docs):
        """Damage localization: flip one document's text; the diff must
        flag exactly the shard that owns that key and call every other
        shard equal."""
        victim = docs.select(F.min("doc_id")).first()[0]
        mutated = docs.withColumn(
            "text",
            F.when(
                F.col("doc_id") == victim, F.lit("corrupted!")
            ).otherwise(F.col("text")),
        )
        a = shard_manifest(docs, "doc_id", COLS, n_shards=16)
        b = shard_manifest(mutated, "doc_id", COLS, n_shards=16)
        d = manifest_diff(a, b)
        by_status = {
            r["status"]: r["cnt"]
            for r in d.groupBy("status")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        assert by_status.get("changed", 0) == 1
        assert by_status.get("equal", 0) == 15
        # the changed shard keeps its row count (content-only damage)
        ch = d.filter(F.col("status") == "changed").first()
        assert ch["n_rows_a"] == ch["n_rows_b"]

    def test_lost_shard_reported_one_sided(self, docs):
        a = shard_manifest(docs, "doc_id", COLS, n_shards=16)
        b = a.filter(F.col("shard") != 3)
        d = manifest_diff(a, b)
        only_a = [r["shard"] for r in d.filter(F.col("status") == "only_a").collect()]
        assert only_a == [3]

    def test_null_content_distinct_from_empty_and_literal(self, spark):
        """The NULL tag must separate NULL, '', and the tag lookalike —
        all three rows land in the checksum distinctly."""
        sigs = {
            shard_manifest(
                spark.createDataFrame([r], "doc_id long, text string"),
                "doc_id",
                ["text"],
                n_shards=1,
            ).first()["content_sig"]
            for r in [(9, None), (9, ""), (9, "\x02NULL")]
        }
        assert len(sigs) == 3


class TestSnapshotDiff:
    def test_statuses(self, spark):
        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, text string"
        )
        new = spark.createDataFrame(
            [(2, "b"), (3, "c2"), (4, "d")], "k long, text string"
        )
        d = snapshot_diff(old, new, "k", ["text"])
        got = {r["key"]: r["status"] for r in d.collect()}
        assert got == {
            1: "removed",
            2: "unchanged",
            3: "changed",
            4: "added",
        }

    def test_carry_cols_fall_back_to_old_side(self, spark):
        old = spark.createDataFrame(
            [(1, "a", "en"), (2, "b", "de")], "k long, text string, lang string"
        )
        new = spark.createDataFrame(
            [(2, "b", "de"), (5, "e", "fr")], "k long, text string, lang string"
        )
        d = snapshot_diff(old, new, "k", ["text"], carry_cols=["lang"])
        got = {r["key"]: (r["status"], r["lang"]) for r in d.collect()}
        assert got[1] == ("removed", "en")  # old-side fallback
        assert got[5] == ("added", "fr")

    def test_identity_diff_all_unchanged(self, docs):
        d = snapshot_diff(docs, docs, "doc_id", COLS)
        n = docs.count()
        counts = {
            r["status"]: r["cnt"]
            for r in d.groupBy("status")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        assert counts == {"unchanged": n}


class TestApplyDelta:
    def _manifest(self, df):
        return shard_manifest(df, "doc_id", COLS, n_shards=16)

    def test_apply_equals_rebuild(self, docs, spark):
        from datamancer_spark.operators.manifest import (
            manifest_apply_delta,
        )
        from pyspark.sql import functions as F

        old = docs.filter(F.col("doc_id") % 3 != 0)
        new = docs.filter(F.col("doc_id") % 4 != 0).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 6 == 1,
                F.concat(F.col("text"), F.lit(" edited")),
            ).otherwise(F.col("text")),
        )
        removed = old.exceptAll(new)
        added = new.exceptAll(old)
        inc = manifest_apply_delta(
            self._manifest(old), removed, added, "doc_id", COLS, 16
        )
        rebuilt = self._manifest(new).select(
            "shard", "n_rows", "content_sig"
        )
        assert sorted(tuple(r) for r in inc.collect()) == sorted(
            tuple(r) for r in rebuilt.collect()
        )

    def test_empty_delta_is_identity(self, docs, spark):
        from datamancer_spark.operators.manifest import (
            manifest_apply_delta,
        )

        empty = docs.limit(0)
        inc = manifest_apply_delta(
            self._manifest(docs), empty, empty, "doc_id", COLS, 16
        )
        base = self._manifest(docs).select("shard", "n_rows", "content_sig")
        assert sorted(tuple(r) for r in inc.collect()) == sorted(
            tuple(r) for r in base.collect()
        )

    def test_phantom_removal_detected_by_rebuild_mismatch(self, docs, spark):
        """XOR can't check membership: removing a row that was never in
        the corpus corrupts the signature — and the corruption is the
        detection, because the manifest then mismatches a rebuild."""
        from datamancer_spark.operators.manifest import (
            manifest_apply_delta,
            manifest_diff,
        )
        from pyspark.sql import functions as F

        phantom = docs.limit(1).withColumn("doc_id", F.lit(10**12))
        inc = manifest_apply_delta(
            self._manifest(docs), phantom, docs.limit(0),
            "doc_id", COLS, 16,
        )
        rebuilt = self._manifest(docs)
        d = manifest_diff(rebuilt, inc)
        assert d.filter(F.col("status") != "equal").count() >= 1

    def test_drop_all_rows_of_a_shard_vanishes_it(self, spark):
        from datamancer_spark.operators.manifest import (
            manifest_apply_delta,
        )

        df = spark.createDataFrame(
            [(i, f"t{i}", "en", "s") for i in range(40)],
            "doc_id long, text string, lang string, source string",
        )
        m = shard_manifest(df, "doc_id", COLS, n_shards=4)
        inc = manifest_apply_delta(
            m, df, df.limit(0), "doc_id", COLS, 4
        )
        assert inc.count() == 0


class TestDiffMultiplicityBlindSpot:
    def test_even_multiplicity_swap_is_changed_not_equal(self, spark):
        """Review r14: XOR cancels even multiplicities — swapping 2
        copies of row R for 2 copies of row S keeps content_sig AND
        n_rows identical, so a sig+count-only diff calls the shard
        'equal'. n_keys/min/max joined the equality check to close
        exactly this."""
        base = [(1, "x", "en", "s")] * 1 + [(7, "r", "en", "s")] * 2
        swap = [(1, "x", "en", "s")] * 1 + [(9, "q", "en", "s")] * 2
        schema = "doc_id long, text string, lang string, source string"
        a = shard_manifest(
            spark.createDataFrame(base, schema), "doc_id", COLS, 1
        )
        b = shard_manifest(
            spark.createDataFrame(swap, schema), "doc_id", COLS, 1
        )
        # precondition of the blind spot: counts equal; sigs may or may
        # not collide (XOR of R,R vs S,S both cancel to the unpaired
        # row's sig) — assert the diff flags the shard regardless
        d = manifest_diff(a, b).first()
        assert d["n_rows_a"] == d["n_rows_b"]
        assert d["sig_a"] == d["sig_b"]  # the XOR blind spot, live
        assert d["status"] == "changed"  # ...and closed
