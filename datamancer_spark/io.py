"""Sources / sinks (SURVEY.md §2.1).

The reference's readCsv (io.nim:686-784) is an mmap'd single-pass parser
with sample-based type inference and mid-parse promotion; Spark's
distributed CSV reader with ``inferSchema`` is the scale-correct
equivalent (splittable, vectorized, permissive mode ≈ promote-to-object).
HDF5 serialization (serialize.nim:8-52) maps to parquet — the columnar
format Spark pushes filters and column pruning into.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import SparkSession

from .frame import DamFrame


def _stage_url_to_warehouse(spark: SparkSession, url: str) -> str:
    """Fetch ``url`` on the driver and copy it into the session's
    warehouse filesystem (``spark.sql.warehouse.dir``) so every executor
    can scan it. Content-addressed by the URL's md5, and repeat reads of
    the same URL really do reuse the staged copy (ADVICE r13): the
    fetch is skipped entirely when the destination already exists, so
    N reads of one URL cost one download + one upload, not N. Callers
    that need to pick up changed remote content delete the staged file
    (or use a fresh URL — e.g. a versioned path), matching the
    immutable-ingest convention of shared warehouse storage."""
    import hashlib
    import tempfile
    import urllib.request

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    )
    digest = hashlib.md5(url.encode("utf-8")).hexdigest()[:16]
    dst = f"{warehouse.rstrip('/')}/_staged_urls/{digest}.csv"
    dst_path = jvm.org.apache.hadoop.fs.Path(dst)
    fs = dst_path.getFileSystem(conf)
    # best-effort sweep of orphaned staging temps (ADVICE r14): a crash
    # between copyFromLocalFile and rename leaves <dst>._staging_* files
    # that nothing else ever deletes. Runs BEFORE the exists()
    # short-circuit (review r15: a sweep gated behind it never fires in
    # the common case where another session completed the stage). Only
    # siblings older than a TTL go (a concurrent healthy session's
    # in-flight temp is seconds old); failures are swallowed — the
    # sweep is hygiene, not correctness.
    try:
        import time

        stale_before = int(time.time() * 1000) - 60 * 60 * 1000  # 1h
        for st in fs.globStatus(
            jvm.org.apache.hadoop.fs.Path(f"{dst}._staging_*")
        ) or []:
            if st.getModificationTime() < stale_before:
                fs.delete(st.getPath(), False)
    except Exception:  # noqa: BLE001 — cleanup must never block staging
        pass
    if fs.exists(dst_path):
        return dst
    fd, local = tempfile.mkstemp(suffix=".csv")
    os.close(fd)
    urllib.request.urlretrieve(url, local)  # noqa: S310
    # upload to a session-unique temp name, then RENAME into place:
    # copyFromLocalFile is not atomic, so a crash (or a concurrent
    # session) mid-copy would otherwise leave a truncated dst that the
    # exists() short-circuit above then reuses forever. FS rename is
    # atomic on HDFS/local; a lost race just means the other session's
    # complete copy (same content-addressed bytes) already won.
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{dst}._staging_{os.getpid()}_{os.path.basename(local)}"
    )
    fs.copyFromLocalFile(
        True,  # delete the tempfile after the copy
        True,  # overwrite a stale temp from a crashed same-pid attempt
        jvm.org.apache.hadoop.fs.Path("file://" + local),
        tmp,
    )
    if not fs.rename(tmp, dst_path):
        fs.delete(tmp, False)
        if not fs.exists(dst_path):
            raise IOError(f"staging rename failed for {url} -> {dst}")
    return dst


def read_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    header: bool = True,
    skip_lines: int = 0,
    max_lines: int | None = None,
    col_names: Sequence[str] | None = None,
    quote: str = '"',
    comment: str | None = "#",
    infer_schema: bool = True,
    escape: str = '"',
) -> DamFrame:
    """Distributed CSV scan mapping readCsv's surface (io.nim:686-784):
    ``sep``/``quote``/``header``/``skipLines``/``maxLines``/``colNames``,
    ``#``-comment headers. URLs are fetched driver-side — the reference
    fetches URLs too (io.nim:700-720) — then STAGED INTO THE WAREHOUSE
    FILESYSTEM before the parallel read: a bare driver-local tempfile
    path would 404 on a real cluster where executors cannot see the
    driver's /tmp (VERDICT r12 #5), and per-node SparkFiles roots
    differ, so addFile can't feed a file:// scan either. The warehouse
    dir is shared storage (HDFS/S3) on any real deployment and a local
    dir under local[*]; the Hadoop FileSystem API handles both. The
    read itself stays the ordinary splittable distributed CSV scan."""
    if path.startswith(("http://", "https://")):
        path = _stage_url_to_warehouse(spark, path)
    reader = (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("quote", quote)
        # doubled-quote escapes (RFC 4180) — matches write_csv and the
        # reference/DuckDB/pandas dialect; Spark's default is backslash
        .option("escape", escape)
        .option("inferSchema", infer_schema)
        .option("mode", "PERMISSIVE")  # promote-don't-fail, like the reference
        .option("nanValue", "NaN")
        .option("positiveInf", "Inf")
        .option("negativeInf", "-Inf")
    )
    if comment:
        reader = reader.option("comment", comment)
    if skip_lines:
        # Spark has no skipRows for CSV; drop the first N physical lines
        # with zipWithIndex — distributed (one extra count job to size
        # the per-partition offsets), unlike a global row_number window
        # which would funnel the whole file through one partition. The
        # lines being skipped are metadata headers, so N is tiny; the
        # filter itself runs partition-parallel.
        rdd = (
            spark.read.text(path)
            .rdd.zipWithIndex()
            .filter(lambda t: t[1] >= skip_lines)
            .map(lambda t: t[0][0])
        )
        df = reader.csv(rdd)
    else:
        df = reader.csv(path)
    if col_names:
        df = df.toDF(*col_names)
    if max_lines is not None:
        df = df.limit(max_lines)
    return DamFrame(df)


def parse_csv_string(
    spark: SparkSession, content: str, sep: str = ",", header: bool = True
) -> DamFrame:
    """CSV from an in-memory string (ref parseCsvString, io.nim:623-668).
    Driver-side by definition (the string lives on the driver); parsed by
    the same distributed reader via a one-element dataset."""
    from pyspark.sql import Row

    lines = [line for line in content.splitlines() if line]
    ds = spark.createDataFrame([Row(value=line) for line in lines])
    reader = (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("inferSchema", True)
    )
    return DamFrame(reader.csv(ds.rdd.map(lambda r: r.value)))


def str_tab_to_df(spark: SparkSession, table: dict[str, list[str]]) -> DamFrame:
    """Table-of-strings → typed frame (ref strTabToDf,
    dataframe.nim:421-493): per column, try int → float → leave string,
    replicating the reference's parse ladder."""
    from pyspark.sql import functions as F

    from .frame import to_df

    frame = to_df({k: [str(v) for v in vs] for k, vs in table.items()}, spark)
    df = frame.df
    for c in df.columns:
        # int rung gated by regex: Spark's lenient cast truncates "1.5"→1
        is_int = F.col(c).rlike(r"^-?\d+$")
        as_dbl = F.col(c).cast("double")
        if df.filter(~is_int & F.col(c).isNotNull()).isEmpty():
            df = df.withColumn(c, F.col(c).cast("long"))
        elif df.filter(as_dbl.isNull() & F.col(c).isNotNull()).isEmpty():
            df = df.withColumn(c, as_dbl)
    return DamFrame(df)


def val_tab_to_df(spark: SparkSession, table: dict[str, list]) -> DamFrame:
    """Mixed-Value table → typed frame (ref valTabToDf,
    dataframe.nim:421-493 — the Value-variant twin of strTabToDf): per
    column, the narrowest Spark type covering the observed Python values —
    bool → boolean, ints → long, ints+floats → double, anything else →
    string (the reference's VObject promotion ladder). Ragged columns pad
    with NULL, matching ``to_df``'s seqsToDf semantics."""
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    def target(vs):
        kinds = {type(v) for v in vs if v is not None}
        if kinds <= {bool}:
            return BooleanType(), lambda v: v
        if kinds <= {bool, int}:
            return LongType(), lambda v: None if v is None else int(v)
        if kinds <= {bool, int, float}:
            return DoubleType(), lambda v: None if v is None else float(v)
        return StringType(), lambda v: None if v is None else str(v)

    cols = list(table)
    n = max((len(v) for v in table.values()), default=0)
    fields, convs = [], {}
    for c in cols:
        t, conv = target(table[c])
        fields.append(StructField(c, t))
        convs[c] = conv
    rows = [
        tuple(
            convs[c](table[c][i]) if i < len(table[c]) else None for c in cols
        )
        for i in range(n)
    ]
    return DamFrame(spark.createDataFrame(rows, StructType(fields)))


def write_csv(
    frame: DamFrame,
    path: str,
    sep: str = ",",
    header: bool = True,
    escape: str = '"',
) -> None:
    """writeCsv (io.nim:807-826) → distributed CSV write (a directory of
    part files at scale; coalesce(1) deliberately NOT default). Escapes
    embedded quotes by DOUBLING them (``escape='"'``, RFC 4180) rather
    than Spark's backslash default, so the output is directly readable
    by DuckDB/pandas/the reference parser without dialect options."""
    (
        frame.df.write.mode("overwrite")
        .option("header", header)
        .option("sep", sep)
        .option("escape", escape)
        .csv(path)
    )


def read_parquet(
    spark: SparkSession,
    *paths: str,
    merge_schema: bool = False,
) -> DamFrame:
    """Columnar (de)serialization — replaces toH5/fromH5 (serialize.nim).

    ``merge_schema=True`` (r13) reconciles files written under EVOLVED
    schemas — the standing reality of any long-lived 100 TB dataset
    (columns added over months of ingest): the union schema is read,
    files missing a column yield NULLs for it, and the per-file footer
    reconciliation is distributed (Spark's mergeSchema), not a driver
    loop. Off by default because schema merging reads every footer up
    front — on a petabyte directory that is an extra planning pass the
    common fixed-schema case shouldn't pay. Multiple ``paths`` read as
    one dataset (snapshot directories, month partitions)."""
    r = spark.read
    if merge_schema:
        r = r.option("mergeSchema", "true")
    return DamFrame(r.parquet(*paths))


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    keep_corrupt: bool = False,
) -> DamFrame:
    """Newline-delimited JSON source — the de-facto interchange format
    for text/training corpora (one document object per line). Maps to
    Spark's native splittable JSON reader: schema inference costs one
    extra pass, so at scale pass an explicit ``schema`` (DDL string) to
    make ingestion single-pass with per-field pruning pushed into the
    scan.

    Malformed lines follow the engine's permissive promote-never-fail
    model (SURVEY.md §1.3): ``keep_corrupt=True`` reads PERMISSIVE and
    retains the raw line in ``_corrupt_record`` for quarantine
    pipelines; otherwise corrupt rows are dropped via DROPMALFORMED.
    The drop path must NOT be a PERMISSIVE read + filter on
    ``_corrupt_record``: a downstream plan that references only the
    corrupt column (e.g. a bare ``count()`` after pruning) raises
    AnalysisException UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN."""
    if keep_corrupt:
        r = spark.read.option("mode", "PERMISSIVE")
        if schema:
            # the corrupt column must be IN the read schema or PERMISSIVE
            # mode silently yields an all-null row for a bad line instead
            # of something filterable
            s = schema
            if "_corrupt_record" not in s:
                s = s + ", _corrupt_record string"
            r = r.schema(s)
        df = r.option("columnNameOfCorruptRecord", "_corrupt_record").json(path)
        return DamFrame(df)
    r = spark.read.option("mode", "DROPMALFORMED")
    if schema:
        r = r.schema(schema)
    return DamFrame(r.json(path))


def write_jsonl(frame: DamFrame, path: str) -> None:
    """JSONL sink — a directory of part files at scale (same rule as
    write_csv: no implicit coalesce(1))."""
    frame.df.write.mode("overwrite").json(path)


def read_avro(
    spark: SparkSession, path: str, schema: str | None = None
) -> DamFrame:
    """Avro OCF source (r15 — the last common interchange format the
    engine lacked; Spark's own avro reader is an external module absent
    here, so operators/avrocodec.py implements the PUBLIC Avro spec).
    Plan shape: a ``binaryFile`` scan of ``*.avro`` part files feeding
    one Arrow-batched ``mapInPandas`` decode — files are the split
    unit, the standard layout for Avro corpora (thousands of part
    files at 100 TB), so the decode parallelizes file-per-task with
    zero shuffles.

    ``schema``: DDL string; when None the driver peeks ONE file's
    header for the embedded schema (a single-file driver read,
    documented cost — pass the schema in production to keep ingestion
    driver-light, the read_jsonl rule)."""
    from .operators.avrocodec import decode_ocf, spark_ddl_of

    glob_path = f"{path.rstrip('/')}/*.avro"
    bf = spark.read.format("binaryFile").load(glob_path)
    if schema is None:
        head = bf.select("content").head()
        if head is None:
            raise ValueError(f"read_avro: no .avro files under {path}")
        fields, _ = decode_ocf(bytes(head["content"]))
        ddl = spark_ddl_of(fields)
    else:
        ddl = schema
        fields = None

    def batches(it):
        import numpy as np
        import pandas as pd

        from .operators.avrocodec import decode_ocf as _dec

        for pdf in it:
            for blob in pdf["content"]:
                fs, rows = _dec(bytes(blob))
                cols = {}
                for j, (name, typ, _nl) in enumerate(fs):
                    vals = [r[j] for r in rows]
                    if typ == "long":
                        cols[name] = pd.array(vals, dtype="Int64")
                    elif typ == "int":
                        cols[name] = pd.array(vals, dtype="Int32")
                    elif typ in (
                        "timestamp-micros",
                        "local-timestamp-micros",
                    ):
                        # raw epoch-µs wire ints -> datetime64[us];
                        # None -> NaT
                        cols[name] = pd.to_datetime(
                            pd.array(vals, dtype="Int64"), unit="us"
                        )
                    elif typ == "date":
                        import datetime as _dt

                        epoch = _dt.date(1970, 1, 1)
                        cols[name] = pd.Series(
                            [
                                None
                                if v is None
                                else epoch + _dt.timedelta(days=v)
                                for v in vals
                            ],
                            dtype="object",
                        )
                    elif typ == "float":
                        mask = np.fromiter(
                            (v is None for v in vals), bool, len(vals)
                        )
                        data = np.fromiter(
                            (0.0 if v is None else v for v in vals),
                            np.float32,
                            len(vals),
                        )
                        cols[name] = pd.arrays.FloatingArray(data, mask)
                    elif typ == "double":
                        # explicit data+mask: pd.array(Float64) folds
                        # NaN into NA, destroying the NaN≠NULL
                        # distinction the engine preserves everywhere
                        mask = np.fromiter(
                            (v is None for v in vals), bool, len(vals)
                        )
                        data = np.fromiter(
                            (0.0 if v is None else v for v in vals),
                            np.float64,
                            len(vals),
                        )
                        cols[name] = pd.arrays.FloatingArray(data, mask)
                    elif typ == "boolean":
                        cols[name] = pd.array(vals, dtype="boolean")
                    else:
                        cols[name] = pd.Series(vals, dtype="object")
                yield pd.DataFrame(cols)

    return DamFrame(bf.select("content").mapInPandas(batches, ddl))


def write_avro(
    frame: DamFrame,
    path: str,
    codec: str = "deflate",
    block_rows: int = 4096,
) -> None:
    """Avro OCF sink: one part file per partition, written from the
    executors in parallel (no single-writer coalesce — the write_csv
    rule). ``codec``: 'deflate' (RAW RFC-1951, the spec's required
    form) or 'null'. Supported column types: long/int/short/byte,
    double/float, string, binary, boolean, timestamp (→
    timestamp-micros), timestamp_ntz (→ local-timestamp-micros), and
    date — each optionally nullable; anything else raises with a cast
    hint rather than silently coercing bytes other Avro readers would
    see. TimestampType columns convert to epoch-µs IN-PLAN
    (``unix_micros``, instant-correct under any executor OS timezone);
    NTZ wall-clock values encode their naive micros by definition.

    Executors write with plain file I/O, so ``path`` must be on a
    filesystem all executors share (local/NFS/fuse mounts — true of
    this deployment and the common shared-warehouse case); an object-
    store deployment would route these bytes through its FS client
    instead. Empty partitions write nothing; partition 0 always writes
    (possibly header-only) so an empty frame still round-trips its
    schema."""
    import glob as _glob

    from .operators.avrocodec import encode_ocf, fields_from_spark_schema

    from pyspark.sql import functions as F

    df = frame.df
    fields = fields_from_spark_schema(df.schema)
    # TimestampType → epoch-µs on the JVM side: the Python Row path
    # materializes timestamps via the executor's OS timezone, which
    # would silently shift instants on non-UTC hosts (review r15);
    # unix_micros is instant-based and timezone-independent
    if any(f.dataType.typeName() == "timestamp" for f in df.schema.fields):
        df = df.select(
            *[
                F.unix_micros(F.col(f.name)).alias(f.name)
                if f.dataType.typeName() == "timestamp"
                else F.col(f.name)
                for f in df.schema.fields
            ]
        )
    os.makedirs(path, exist_ok=True)
    # overwrite semantics: clear prior part files AND any .tmp left by
    # a crashed writer (the rename never published them)
    for old in _glob.glob(os.path.join(path, "*.avro")) + _glob.glob(
        os.path.join(path, ".part-*.avro.tmp")
    ):
        os.remove(old)

    def write_part(rows):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        first = next(iter(rows), None)
        if first is None and pid != 0:
            return
        import itertools

        it = itertools.chain([first], rows) if first is not None else iter(())
        blob = encode_ocf(
            (tuple(r[n] for n, _t, _nl in fields) for r in it),
            fields,
            codec=codec,
            block_rows=block_rows,
        )
        tmp = os.path.join(path, f".part-{pid:05d}.avro.tmp")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, os.path.join(path, f"part-{pid:05d}.avro"))

    df.foreachPartition(write_part)


def read_orc(spark: SparkSession, path: str) -> DamFrame:
    """ORC source (Spark-native vectorized reader) — same columnar role
    as parquet for warehouses standardized on ORC; predicate pushdown
    and column pruning apply identically."""
    return DamFrame(spark.read.orc(path))


def write_orc(
    frame: DamFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
) -> None:
    """ORC sink with partition pruning via ``partition_by`` (same scale
    rule as write_parquet; bucketing-to-table works through
    write_parquet's saveAsTable path if needed)."""
    w = frame.df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: str | None = None,
) -> DamFrame:
    """XML source (Spark 4 built-in, the spark-xml lineage): one row per
    ``row_tag`` element, attributes as ``_attr`` columns. Pass an
    explicit ``schema`` in production — inference is a full extra pass,
    the same rule as read_json_lines."""
    reader = spark.read.option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return DamFrame(reader.xml(path))


def write_xml(
    frame: DamFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
) -> None:
    """XML sink (row-per-element; interchange format for systems that
    still speak XML — files are splittable on read via rowTag)."""
    (
        frame.df.write.mode("overwrite")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .xml(path)
    )


def read_arrow_ipc(
    spark: SparkSession, path: str, schema=None
) -> DamFrame:
    """Distributed Arrow IPC (Feather v2 / ``.arrow``) source (r10):
    the standard ML-pipeline interchange format. Files are NOT
    block-splittable like parquet, so parallelism is per FILE — a
    ``binaryFile`` scan distributes whole files to executors and each
    deserializes its own with pyarrow (zero-copy into the same Arrow
    batches ``mapInPandas`` already speaks); fine for the many-files
    layout every Arrow-writing pipeline produces, wrong for one giant
    file (repack or use parquet). ``schema``: a Spark StructType or
    DDL string; when omitted, ONE file's IPC footer is read
    driver-side (schema only, not data) and converted — explicit
    schema skips that open and guards against drift. Both the file
    (Feather v2) and stream IPC framings are accepted per file."""
    import glob as _glob

    import pyarrow as pa
    from pyspark.sql.pandas.types import from_arrow_schema
    from pyspark.sql.types import StructType

    if schema is None:
        if _glob.has_magic(path) or os.path.isfile(path):
            pat = path
        else:
            pat = os.path.join(path, "*")
        first = sorted(
            p for p in _glob.glob(pat)
            if os.path.isfile(p) and not os.path.basename(p).startswith((".", "_"))
        )
        if not first:
            raise FileNotFoundError(f"no Arrow IPC files under {path!r}")
        with open(first[0], "rb") as f:
            blob = f.read()
        schema = from_arrow_schema(_open_ipc(pa, blob).schema)
    elif isinstance(schema, str):
        schema = StructType.fromDDL(schema)

    files = spark.read.format("binaryFile").load(path)

    def batches(it):
        import pandas as pd  # noqa: F401 (mapInPandas contract)
        import pyarrow as pa

        for pdf in it:
            for blob in pdf["content"]:
                reader = _open_ipc(pa, bytes(blob))
                for b in reader:
                    yield b.to_pandas()

    return DamFrame(files.select("content").mapInPandas(batches, schema))


def _open_ipc(pa, blob: bytes):
    """Iterable-with-``.schema`` over one IPC blob's record batches:
    random-access (Feather v2, ARROW1 magic) or stream framing."""
    buf = pa.BufferReader(blob)
    if blob[:6] == b"ARROW1":
        f = pa.ipc.open_file(buf)

        class _FileBatches:
            schema = f.schema

            def __iter__(self):
                return (
                    f.get_batch(i) for i in range(f.num_record_batches)
                )

        return _FileBatches()
    return pa.ipc.open_stream(buf)


def write_arrow_ipc(
    frame: DamFrame, path: str, compression: str | None = None
) -> None:
    """Arrow IPC (Feather v2) sink (r10): one ``part-*.arrow`` file per
    partition, written EXECUTOR-SIDE (requires a shared filesystem,
    like every file sink) with the exact Arrow schema derived from the
    Spark schema — so a round trip through ``read_arrow_ipc`` is
    type-stable. Empty partitions write nothing; the per-partition
    manifest (file, rows) is the action that drives the job.

    ``compression`` (r11): ``"lz4"`` / ``"zstd"`` buffer compression
    per the IPC spec — what real Feather v2 producers emit by default,
    so the READ side (``read_arrow_ipc``) handles compressed batches
    transparently via pyarrow's codec layer; the writer validates the
    codec eagerly (driver-side) so a missing build fails at plan time,
    not inside an executor task."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    if compression is not None:
        codec = {"lz4": "lz4_frame", "zstd": "zstd"}.get(compression)
        if codec is None or not pa.Codec.is_available(codec):
            raise ValueError(
                f"unsupported IPC compression {compression!r}: pass "
                "'lz4', 'zstd', or None"
            )

    os.makedirs(path, exist_ok=True)
    arrow_schema = to_arrow_schema(frame.df.schema)
    cols = [f.name for f in frame.df.schema.fields]

    def write_part(it):
        import uuid

        import pandas as pd
        import pyarrow as pa
        from pyspark import TaskContext

        batches = []
        for pdf in it:
            if len(pdf):
                batches.append(
                    pa.RecordBatch.from_pandas(
                        pdf[cols], schema=arrow_schema, preserve_index=False
                    )
                )
        if batches:
            pid = TaskContext.get().partitionId()
            fname = os.path.join(
                path, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.arrow"
            )
            opts = pa.ipc.IpcWriteOptions(compression=compression)
            with pa.OSFile(fname, "wb") as sink:
                with pa.ipc.new_file(
                    sink, arrow_schema, options=opts
                ) as w:
                    for b in batches:
                        w.write_batch(b)
            yield pd.DataFrame(
                {"file": [fname], "rows": [sum(len(b) for b in batches)]}
            )

    frame.df.mapInPandas(write_part, "file string, rows long").collect()


def write_parquet(
    frame: DamFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    bucket_by: tuple[int, Sequence[str]] | None = None,
    table_name: str | None = None,
    bloom_filter_cols: Sequence[str] | None = None,
    bloom_filter_ndv: int | None = None,
    cluster_by: Sequence[str] | None = None,
    cluster_files: int | None = None,
) -> None:
    """Parquet sink with the four scale levers: ``partition_by`` for
    partition-pruned scans, ``bucket_by`` (requires ``table_name``) for
    shuffle-free co-located joins on the bucket keys,
    ``bloom_filter_cols`` (r11) for per-column parquet BLOOM FILTERS —
    the point-lookup lever: an equality predicate on a bloom-filtered
    column skips whole row groups whose filter says definitely-absent,
    which min/max stats cannot do for high-cardinality unsorted ids
    (fingerprints, doc ids) at 100 TB — and ``cluster_by`` (r13) for
    RANGE CLUSTERING: repartitionByRange + sortWithinPartitions on the
    given keys, so every file/row group covers a narrow, disjoint key
    range and parquet min/max statistics turn range predicates into
    whole-row-group skips (the data-skipping lever behind Delta's
    OPTIMIZE ... ZORDER; for a single key or a prefix-ordered key list
    the lexicographic sort here IS the optimal layout — true
    bit-interleaved Z-order only wins when queries filter on later
    keys without the earlier ones). An unclustered write leaves every
    row group spanning ~the full key range, making min/max useless;
    tests/test_io.py pins the skip-fraction difference via pyarrow
    row-group metadata. ``bloom_filter_ndv`` sizes the bloom filter
    (expected distinct values per row group; parquet-mr default
    otherwise). Columns are validated against the schema eagerly.
    Verification note: pyarrow (16.x) does not expose bloom offsets in
    its metadata API, so tests pin the behavior via the written-bytes
    delta and roundtrip equality."""
    df = frame.df
    if cluster_by:
        missing = [c for c in cluster_by if c not in df.columns]
        if missing:
            raise ValueError(f"cluster_by not in schema: {missing}")
        from pyspark.sql import functions as F

        cols = [F.col(c) for c in cluster_by]
        # cluster_files sizes the layout (files ~= disjoint key ranges);
        # without it AQE may coalesce a small write into one file whose
        # single row group spans the whole range — no skipping possible
        if cluster_files is not None:
            df = df.repartitionByRange(int(cluster_files), *cols)
        else:
            df = df.repartitionByRange(*cols)
        df = df.sortWithinPartitions(*cluster_by)
    w = df.write.mode("overwrite")
    if bloom_filter_cols:
        missing = [c for c in bloom_filter_cols
                   if c not in frame.df.columns]
        if missing:
            raise ValueError(
                f"bloom_filter_cols not in schema: {missing}"
            )
        for c in bloom_filter_cols:
            w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
            if bloom_filter_ndv is not None:
                w = w.option(
                    f"parquet.bloom.filter.expected.ndv#{c}",
                    str(int(bloom_filter_ndv)),
                )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        if not table_name:
            raise ValueError("bucketBy requires a table_name (saveAsTable)")
        w.bucketBy(n, *cols).sortBy(*cols).option("path", path).saveAsTable(table_name)
        return
    w.parquet(path)


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_mb: int = 128,
) -> int:
    """Small-files compaction (r11) — the standing operational chore of
    every streaming/incremental sink: read a fragmented parquet
    directory and rewrite it as ``ceil(total_bytes / target_mb)``
    files. Fragment counts come from the actual on-disk listing (the
    same listing the read performs), the rewrite is ONE round-robin
    repartition (no key skew possible), and the function returns the
    output file count. At 100 TB the same routine runs per partition
    directory — compaction parallelism is across partitions, the
    repartition within one."""
    import glob as _glob
    import math

    files = [
        f
        for f in _glob.glob(os.path.join(in_path, "**", "*"),
                            recursive=True)
        if os.path.isfile(f) and not os.path.basename(f).startswith(
            (".", "_")
        )
    ]
    if not files:
        raise FileNotFoundError(f"no data files under {in_path!r}")
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(in_path)
    df.repartition(n_out).write.mode("overwrite").parquet(out_path)
    return len(
        [
            f
            for f in os.listdir(out_path)
            if f.endswith(".parquet")
        ]
    )


# Session-scoped table-handle cache (r15-opt): ``spark.read.parquet``
# pays driver-side FileIndex + footer-schema work through py4j on EVERY
# call (measured 0.1-0.7 s per call even on a 1 KB file), and every
# query constructor calls ``load_tables`` — across a bench run that is
# hundreds of redundant metadata reads. The cache holds the LAZY
# DataFrame handle per (session, path); no data or results are cached
# — every execution still scans the parquet files. File identity
# (size + mtime_ns) invalidates the entry when the driver regenerates
# testdata; weak session keys drop entries when a session is replaced.
_TABLE_CACHE = None  # weakref.WeakKeyDictionary[SparkSession, dict]


def _session_cache(spark: SparkSession) -> dict:
    global _TABLE_CACHE
    if _TABLE_CACHE is None:
        import weakref

        _TABLE_CACHE = weakref.WeakKeyDictionary()
    cache = _TABLE_CACHE.get(spark)
    if cache is None:
        cache = {"defaults": False, "tables": {}}
        _TABLE_CACHE[spark] = cache
    return cache


def load_tables(spark: SparkSession, sf_dir: str, names: Sequence[str] | None = None) -> dict[str, DamFrame]:
    """Load the driver's TPC-H-ish parquet tables from an sf directory."""
    names = names or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from .session import ensure_session_defaults

    cache = _session_cache(spark)
    # Defensive: the caller's session may not be ours (the verification
    # driver builds its own); these confs are required for correct reads.
    # Once per session — plus a one-conf sentinel check on every later
    # call (ADVICE r15): the threat model is a foreign driver session,
    # and if that driver mutates a required conf mid-session the cached
    # "defaults applied" flag would otherwise go stale. One conf.get is
    # ~1 ms of py4j; re-assert everything only when it drifted.
    if not cache["defaults"]:
        ensure_session_defaults(spark)
        cache["defaults"] = True
    else:
        try:
            if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
                ensure_session_defaults(spark)
        except Exception:
            ensure_session_defaults(spark)

    out: dict[str, DamFrame] = {}
    for n in names:
        p = os.path.join(sf_dir, f"{n}.parquet")
        try:
            st = os.stat(p)
        except OSError:
            continue
        sig: tuple = (st.st_size, st.st_mtime_ns)
        if os.path.isdir(p):
            # Directory datasets (Spark-written {name}.parquet dirs):
            # in-place rewrites change MEMBER files without necessarily
            # touching the directory's own size/mtime (ADVICE r15), so
            # fold the members' stats into the signature. Driver
            # testdata tables are single files and never take this
            # branch; it exists so a stale FileIndex can't be served
            # for directory inputs.
            try:
                members = []
                for m in sorted(os.listdir(p)):
                    ms = os.stat(os.path.join(p, m))
                    members.append((m, ms.st_size, ms.st_mtime_ns))
                sig = sig + (tuple(members),)
            except OSError:
                pass
        hit = cache["tables"].get(p)
        if hit is not None and hit[0] == sig:
            out[n] = hit[1]
            continue
        df = spark.read.parquet(p)
        # TIMESTAMP(NANOS) parquet columns arrive as long ns-since-epoch
        # (session.py nanosAsLong); normalize to microsecond timestamps,
        # the precision DuckDB/Spark agree on. Integer division keeps
        # exactness (doubles can't hold ns epochs > 2^53).
        if n == "events" and isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        cache["tables"][p] = (sig, df)
        out[n] = df
    return {k: DamFrame(v) for k, v in out.items()}


def to_html(frame: DamFrame, n: int = 100) -> str:
    """toHtml (io.nim:866-917) — driver-side nicety over a bounded sample."""
    return frame.df.limit(n).toPandas().to_html()


def show_browser(frame: DamFrame, n: int = 100) -> str:
    """showBrowser (io.nim:866-917): render ``to_html`` to a temp file and
    open it in the system browser. Headless-safe: the open step is
    best-effort (webbrowser returns False without a display); always
    returns the written file path."""
    import tempfile
    import webbrowser

    html = to_html(frame, n)
    fd, path = tempfile.mkstemp(suffix=".html", prefix="damframe_")
    os.close(fd)
    with open(path, "w", encoding="utf-8") as f:
        f.write(html)
    try:
        webbrowser.open(f"file://{path}")
    except Exception:
        pass
    return path


def to_org_table(frame: DamFrame, n: int = 100) -> str:
    """toOrgTable (io.nim:919-939)."""
    pdf = frame.df.limit(n).toPandas()
    head = "| " + " | ".join(map(str, pdf.columns)) + " |"
    sep = "|" + "|".join("---" for _ in pdf.columns) + "|"
    rows = ["| " + " | ".join(str(v) for v in r) + " |" for r in pdf.itertuples(index=False)]
    return "\n".join([head, sep, *rows])
