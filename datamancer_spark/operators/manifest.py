"""Corpus integrity manifests and snapshot deltas.

At 100 TB a corpus is thousands of shards on shared storage, copied,
compacted, and re-partitioned between pipeline stages. Two questions
dominate operations: "is THIS copy still exactly THAT corpus?" and
"what changed between yesterday's snapshot and today's?". Both must be
answerable WITHOUT a single-point-of-comparison re-read:

- ``shard_manifest`` reduces the corpus to a tiny per-shard frame of
  counts and ORDER-INVARIANT content checksums (a BIT_XOR of per-row
  60-bit md5 hashes). Order invariance is the load-bearing property:
  Spark gives no row-order guarantee across partitions/AQE re-plans,
  so any positional checksum would flap run to run, while a commutative
  XOR is stable under ANY partitioning — two manifests built on
  different clusters with different parallelism agree iff the row
  multisets agree per shard (XOR is also self-inverse, which is what
  makes ``manifest_apply_delta`` possible). Shard assignment uses the
  repo's portable md5 hash, so a DuckDB twin (or any other engine)
  rebuilds the exact manifest for differential verification.
- ``manifest_diff`` compares two manifests shard-by-shard: a corrupted
  or lost row flips exactly its shard's signature, so re-validation
  after an incident touches 1/n_shards of the data, not all of it.
- ``snapshot_diff`` is the row-level delta between two snapshots of a
  keyed corpus (full outer join on the key, fingerprint comparison →
  added/removed/changed/unchanged) — the primitive behind incremental
  corpus refreshes, where re-processing only the changed slice is the
  difference between a nightly job and a weekly one.

Reference parity: the reference engine has no manifest surface (its
serialize.nim:8-52 HDF5 round-trip assumes a single trusted file);
this tier is beyond-reference scale infrastructure, same category as
the dedup/ANN tiers.

Plan shapes: shard_manifest is one scan + one n_shards-sized groupBy;
the counts and BIT_XOR signature partial-aggregate map-side to
n_shards*cores rows, while the exact n_keys (count DISTINCT — the
duplicate-key detector) adds one key-sized exchange of (shard, key)
pairs, map-side-deduped, ~16 bytes/row — small next to the corpus but
not free; pass it up by reading n_rows alone when keys are trusted
unique. snapshot_diff is one full outer join on the key,
shuffle-partitioned on both sides, no driver collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash


def row_signature(*cols: Column, seed: int | str = 0) -> Column:
    """Portable per-row 60-bit hash over the type-tagged concatenation
    of ``cols``: NULL encodes as ``chr(2)+'N'`` and a value v as
    ``chr(2)+'V'+v`` — the value arm ALWAYS carries the V prefix, so no
    literal string (not even one spelling the NULL tag itself) can
    collide with NULL, and ``chr(31)`` separators keep ("a","b") and
    ("ab","") apart. A plain coalesce-to-sentinel tag fails exactly
    this: a row whose text IS the sentinel hashes like a NULL (caught
    by test_null_content_distinct...). Tag byte is ``chr(2)`` (STX),
    not NUL: DuckDB VARCHARs reject embedded NUL bytes, and the twin
    must build the identical string."""
    tagged = [
        F.when(c.isNull(), F.lit("\x02N")).otherwise(
            F.concat(F.lit("\x02V"), c.cast("string"))
        )
        for c in cols
    ]
    return portable_hash(F.concat_ws("\x1f", *tagged), seed=seed)


def shard_manifest(
    df: DataFrame,
    key_col: str,
    content_cols: list[str],
    n_shards: int = 32,
) -> DataFrame:
    """Per-shard integrity manifest: (shard, n_rows, n_keys, content_sig,
    min_key, max_key). ``content_sig`` is the order-invariant BIT_XOR
    of per-row signatures over ``key_col + content_cols`` — commutative
    AND overflow-free (a 64-bit SUM of 60-bit hashes overflows past
    ~8 rows-per-shard-bits, and Spark's long sum wraps silently where
    DuckDB widens to HUGEINT — the one cross-engine divergence a
    checksum must not have). XOR's known blind spot — an even number
    of IDENTICAL rows cancels out — is covered by n_rows/n_keys moving
    whenever row multiplicity does. Shards are assigned by the portable
    hash of the KEY (not the content), so a changed row stays in its
    shard and the diff localizes."""
    key = F.col(key_col)
    shard = portable_hash(key.cast("string"), seed="shard") % n_shards
    sig = row_signature(key, *[F.col(c) for c in content_cols], seed="sig")
    return (
        df.select(
            shard.alias("shard"),
            key.alias("_k"),
            sig.alias("_sig"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("_k").cast("long").alias("n_keys"),
            F.bit_xor("_sig").cast("long").alias("content_sig"),
            F.min("_k").alias("min_key"),
            F.max("_k").alias("max_key"),
        )
    )


def manifest_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Shard-level comparison of two ``shard_manifest`` outputs: one row
    per shard present in either, with a ``status`` of 'equal',
    'changed', 'only_a', or 'only_b'. Both inputs are n_shards-sized,
    so the join broadcasts; verifying a 100 TB copy costs two manifest
    scans (one per side, each parallel) and this tiny join.

    Equality covers EVERY manifest column both sides carry: n_rows +
    content_sig alone leave XOR's even-multiplicity blind spot open
    (swap 2 copies of row R for 2 copies of row S — sig XORs to the
    same value and n_rows is unchanged, but n_keys/min/max move), so
    n_keys/min_key/max_key join the check whenever present (full
    ``shard_manifest`` outputs have them; ``manifest_apply_delta``'s
    incremental form legitimately doesn't — distinct counts and
    extremes don't XOR-invert)."""
    extra = [
        c
        for c in ("n_keys", "min_key", "max_key")
        if c in a.columns and c in b.columns
    ]
    an = a.select(
        F.col("shard"),
        F.col("n_rows").alias("n_rows_a"),
        F.col("content_sig").alias("sig_a"),
        *[F.col(c).alias(f"_a_{c}") for c in extra],
    )
    bn = b.select(
        F.col("shard"),
        F.col("n_rows").alias("n_rows_b"),
        F.col("content_sig").alias("sig_b"),
        *[F.col(c).alias(f"_b_{c}") for c in extra],
    )
    j = an.join(bn, "shard", "full_outer")
    equal = (F.col("sig_a") == F.col("sig_b")) & (
        F.col("n_rows_a") == F.col("n_rows_b")
    )
    for c in extra:
        # eqNullSafe: a NULL extreme (can't happen for real keys, but
        # the check must not silently pass on one) compares as a value
        equal = equal & F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}"))
    status = (
        F.when(F.col("sig_a").isNull(), F.lit("only_b"))
        .when(F.col("sig_b").isNull(), F.lit("only_a"))
        .when(equal, F.lit("equal"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        "shard", "n_rows_a", "n_rows_b", "sig_a", "sig_b",
        status.alias("status"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    content_cols: list[str],
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level delta between two snapshots of a keyed corpus: one row
    per key present in either snapshot, with ``status`` in {'added',
    'removed', 'changed', 'unchanged'} by comparing portable content
    signatures. One full outer equi-join on the key — both sides
    shuffle-partition on it, nothing collects. Duplicate keys within a
    snapshot are a data error for a keyed corpus; they're surfaced (not
    masked) because the join fans them out and the counts stop
    reconciling. ``carry_cols`` ride along for downstream grouping
    (new-side value, old-side fallback for removed keys) so callers
    don't pay a second corpus join to recover dimensions."""
    carry = carry_cols or []
    sig = row_signature(*[F.col(c) for c in content_cols], seed="snap")
    o = old.select(
        F.col(key_col).alias("key"),
        sig.alias("_sig_old"),
        *[F.col(c).alias(f"_old_{c}") for c in carry],
    )
    n = new.select(
        F.col(key_col).alias("key"),
        sig.alias("_sig_new"),
        *[F.col(c).alias(f"_new_{c}") for c in carry],
    )
    j = o.join(n, "key", "full_outer")
    status = (
        F.when(F.col("_sig_old").isNull(), F.lit("added"))
        .when(F.col("_sig_new").isNull(), F.lit("removed"))
        .when(F.col("_sig_old") == F.col("_sig_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        "key",
        status.alias("status"),
        *[
            F.coalesce(F.col(f"_new_{c}"), F.col(f"_old_{c}")).alias(c)
            for c in carry
        ],
    )


def manifest_apply_delta(
    manifest: DataFrame,
    removed: DataFrame,
    added: DataFrame,
    key_col: str,
    content_cols: list[str],
    n_shards: int = 32,
) -> DataFrame:
    """Incrementally update a ``shard_manifest`` from a row DELTA — no
    corpus rescan. This is why the signature is XOR and not a hash of
    hashes: XOR is its own inverse, so removing a row is the SAME
    operation as adding it, and

        sig(new) = sig(old) XOR sig(removed rows) XOR sig(added rows)

    holds per shard exactly. At 100 TB the difference is scanning the
    (tiny) delta instead of the corpus to keep the integrity manifest
    current after every incremental refresh. A row listed in
    ``removed`` that was never in the corpus corrupts the signature by
    construction (XOR can't check membership) — the manifest would then
    MISMATCH a rebuild, which is the detection, not a silent pass.

    Returns (shard, n_rows, content_sig): n_keys/min/max are not
    XOR-updatable (distinct counts and extremes don't invert), so the
    incremental form carries the multiset-integrity columns only;
    ``shard_manifest`` remains the full-rescan surface when those are
    needed."""
    rm = shard_manifest(removed, key_col, content_cols, n_shards).select(
        "shard",
        F.col("n_rows").alias("_rm_n"),
        F.col("content_sig").alias("_rm_sig"),
    )
    ad = shard_manifest(added, key_col, content_cols, n_shards).select(
        "shard",
        F.col("n_rows").alias("_ad_n"),
        F.col("content_sig").alias("_ad_sig"),
    )
    base = manifest.select("shard", "n_rows", "content_sig")
    j = base.join(rm, "shard", "full_outer").join(ad, "shard", "full_outer")
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")  # noqa: E731
    out = j.select(
        "shard",
        (z("n_rows") - z("_rm_n") + z("_ad_n")).cast("long").alias("n_rows"),
        z("content_sig")
        .bitwiseXOR(z("_rm_sig"))
        .bitwiseXOR(z("_ad_sig"))
        .cast("long")
        .alias("content_sig"),
    )
    # an all-zero shard (every row removed, nothing added) vanishes from
    # a rebuild; drop it here too so apply == rebuild exactly
    return out.filter((F.col("n_rows") != 0) | (F.col("content_sig") != 0))
