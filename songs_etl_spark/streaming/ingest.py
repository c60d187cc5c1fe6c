"""Streaming ingest operators: watermarked event-time aggregation, streaming
dedup, and stateful sessionization.

The reference has no streaming — its freshness model is a daily cron full
refresh (terraform/cloud-scheduler.tf:4-5, WRITE_TRUNCATE loads). These
operators are the incremental replacement: a file-source stream drained with
``Trigger.AvailableNow`` gives exactly-once catch-up batches (the cron
shape), and the same plans run continuously against a live source.

Scale notes: state (window aggregates, seen-keys for dedup, open sessions)
lives in the partitioned state store keyed by the group keys, so state size
is bounded by watermark horizon × key cardinality, not stream length;
watermarks both bound state and define late-data semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from songs_etl_spark.plans._util import money


def hourly_events_watermarked(
    events: DataFrame, watermark: str = "2 hours", window: str = "1 hour"
) -> DataFrame:
    """Event-time tumbling-window aggregate in *append* mode discipline: the
    watermark lets the store drop windows older than the horizon and emit
    them exactly once. (The oracle-checked complete-mode variant for finite
    drains is plans/streaming.py.)"""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(money("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def upsert_each_batch(
    agg_stream: DataFrame, target_path: str, keys: list[str]
):
    """``foreachBatch`` sink that MERGEs each micro-batch into a Parquet
    target by key — the streaming→warehouse landing pattern (stream update
    mode + batch merge), replacing the reference's daily WRITE_TRUNCATE with
    continuous incremental upserts.

    Idempotency (exactly-once effect under retries): the merge keys make a
    replayed micro-batch rewrite the same rows with the same values, so a
    restart from the last checkpoint converges to the identical target
    (asserted by the registry query's oracle and tests). The target is
    re-read per batch; ``localCheckpoint`` materializes the merge before the
    overwrite so the read and the write of the same path never overlap.

    At scale the same sink body runs MERGE INTO against a transactional
    table format; the merge plan itself (operators/merge.py) is
    broadcast-capable and keyed — per-batch cost scales with batch size,
    not target size, once the table format provides key-range pruning.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into(batch_df, target_path, keys)

    return (
        agg_stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
    )


def merge_batch_into(batch_df: DataFrame, target_path: str, keys: list[str]) -> None:
    """The ``foreachBatch`` sink body of :func:`upsert_each_batch`, public so
    a replayed micro-batch (Spark re-invokes the sink with the same data
    after a failure) can be exercised directly: re-running a batch MERGEs the
    same keys to the same values — the target is unchanged (asserted by
    tests/test_streaming.py).

    First batch is detected by an explicit filesystem existence check, NOT
    by catching exceptions around the target read: a transient read failure,
    corrupt footer, or batch/target schema mismatch must FAIL the stream
    (the checkpoint replays the batch) rather than silently overwrite the
    target with only the current micro-batch."""
    from songs_etl_spark.operators.merge import merge_upsert

    spark = batch_df.sparkSession
    if _hadoop_path_exists(spark, target_path):
        target = spark.read.parquet(target_path)
        merged = merge_upsert(target, batch_df.select(*target.columns), keys)
    else:
        merged = batch_df
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(target_path)


def _hadoop_path_exists(spark, path: str) -> bool:
    """Explicit Hadoop-FS existence probe shared by every first-batch check
    (see merge_batch_into's docstring for why existence, not try/except,
    is the contract): one definition so the corpus-read and merge paths
    can't diverge."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.exists(jvm_path)


def dedup_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on the event key within the watermark horizon
    (``dropDuplicatesWithinWatermark``): the seen-key state is evicted as the
    watermark advances, so memory is bounded — the streaming analog of the
    batch dedup_exact operator."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session-window aggregation with a dynamic gap (F.session_window): the
    streaming restatement of the batch lag/gap sessionization
    (plans/relational.py user_sessionization). Sessions close when no event
    arrives within ``gap``; the watermark finalizes closed sessions."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum(money("value")).cast("double").alias("sum_value"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def admit_against_corpus(
    batch_docs: DataFrame,
    corpus_docs: DataFrame,
    threshold: float = 0.8,
    df_cap: int | None = None,
) -> DataFrame:
    """Near-dup admission verdicts for one batch of documents against an
    already-admitted corpus: (doc_id, duplicate_of, is_new).

    The batch form of the registered ``dedup_incremental_batch`` probe
    (plans/dedup.py) with explicit frames instead of the testdata's
    id-space split: batch docs probe the union's DF_CAP-capped inverted
    shingle index; corpus–corpus pairs are never generated (asymmetric join
    condition), so per-batch cost is |batch shingles| × bounded posting
    length — independent of corpus size. Within the batch, earlier (smaller
    id) docs are admission targets for later ones, matching the registered
    semantics.

    Replay-deterministic: corpus rows whose doc_id reappears in the batch
    are dropped before indexing (a replayed micro-batch re-presents docs
    the previous attempt already admitted; keeping both copies would
    double-count their shingles toward DF_CAP and could flip candidate
    sets), so a replay sees the identical index and returns identical
    verdicts (asserted in tests/test_streaming_admission.py)."""
    from songs_etl_spark.functions.text import tokens, word_shingles
    from songs_etl_spark.plans.dedup import DF_CAP

    cap = DF_CAP if df_cap is None else df_cap
    batch = batch_docs.select("doc_id", "text", F.lit(True).alias("is_batch"))
    corpus = (
        corpus_docs.select("doc_id", "text", F.lit(False).alias("is_batch"))
        .join(batch.select("doc_id"), "doc_id", "left_anti")
    )
    union = corpus.unionByName(batch)
    base = union.select(
        "doc_id", "is_batch", tokens("text").alias("tok")
    ).filter(F.size("tok") >= 3)
    sh = base.select(
        "doc_id",
        "is_batch",
        F.array_distinct(word_shingles(F.col("tok"), 3)).alias("shingles"),
    )
    ex = sh.select(
        "doc_id",
        "is_batch",
        F.explode(F.transform("shingles", lambda x: F.xxhash64(x))).alias("s"),
    )
    rare = ex.groupBy("s").count().filter(F.col("count") <= cap).select("s")
    exf = ex.join(rare, "s")
    sizes = exf.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = exf.select("s", F.col("doc_id").alias("da"), F.col("is_batch").alias("a_batch"))
    b = exf.filter("is_batch").select(F.col("s").alias("s2"), F.col("doc_id").alias("db"))
    cand = (
        a.join(
            b,
            (a.s == b.s2)
            & (F.col("da") != F.col("db"))
            & (~F.col("a_batch") | (F.col("da") < F.col("db"))),
        )
        .groupBy("da", "db")
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"))
    jac = F.col("common").cast("double") / (F.col("na") + F.col("nb") - F.col("common"))
    dups = (
        cand.join(sa, "da")
        .join(sb, "db")
        .filter(jac >= threshold)
        .groupBy("db")
        .agg(F.min("da").alias("duplicate_of"))
    )
    return (
        batch.select("doc_id")
        .join(dups.withColumnRenamed("db", "doc_id"), "doc_id", "left")
        .select("doc_id", "duplicate_of", F.col("duplicate_of").isNull().alias("is_new"))
    )


def admit_batch_into(
    batch_df: DataFrame,
    corpus_path: str,
    verdicts_path: str,
    threshold: float = 0.8,
) -> None:
    """The ``foreachBatch`` sink body of :func:`admit_documents_stream`:
    score the micro-batch against the admitted-corpus parquet, MERGE the
    genuinely-new docs into the corpus and the verdicts into the admission
    log — both keyed by doc_id, so a replayed micro-batch rewrites the same
    rows with the same values (exactly-once effect; see
    merge_batch_into)."""
    spark = batch_df.sparkSession
    if _hadoop_path_exists(spark, corpus_path):
        corpus = spark.read.parquet(corpus_path)
    else:
        corpus = spark.createDataFrame([], batch_df.schema)
    # Materialize verdicts BEFORE the corpus merge overwrites the parquet
    # this plan reads — a lazy verdict plan would otherwise re-read the
    # already-updated corpus when the log merge evaluates it.
    verdicts = admit_against_corpus(batch_df, corpus, threshold).localCheckpoint(
        eager=True
    )
    admitted = batch_df.join(
        verdicts.filter("is_new").select("doc_id"), "doc_id"
    )
    merge_batch_into(admitted, corpus_path, ["doc_id"])
    merge_batch_into(verdicts, verdicts_path, ["doc_id"])


def admit_embedding_batch_into(
    batch_df: DataFrame,
    corpus_path: str,
    index_path: str,
    verdicts_path: str,
    threshold: float = 0.9,
    bits_per_band: int = 4,
    n_bands: int = 4,
    dim: int = 4,
) -> None:
    """The ``foreachBatch`` sink body of :func:`admit_embeddings_stream` —
    the embedding analog of :func:`admit_batch_into`, with one structural
    upgrade: the corpus's sign-LSH band index is PERSISTED at
    ``index_path`` and maintained incrementally (admitted rows' signatures
    appended per drain), so a drain never re-signatures the corpus — batch
    signatures are batch-sized work, the probe is an equi-join against the
    stored index, and corpus×corpus pairs are never generated
    (plans/similarity._admission_verdicts).

    The admitted corpus is duplicate-free BY CONSTRUCTION (only is_new
    vectors enter), so every stored vector is its own representative and
    the stored (rep, band, bval) rows ARE the group-collapsed index.
    Replay-deterministic: corpus/index rows whose vec_id reappears in the
    batch are dropped before probing, and all three writes MERGE by key —
    a replayed micro-batch converges to identical state."""
    from songs_etl_spark.plans.similarity import (
        _admission_verdicts,
        collapse_exact_duplicates,
        embedding_band_index,
    )

    spark = batch_df.sparkSession
    batch_ids = batch_df.select("vec_id")
    if _hadoop_path_exists(spark, corpus_path):
        corpus = spark.read.parquet(corpus_path).join(batch_ids, "vec_id", "left_anti")
    else:
        corpus = spark.createDataFrame([], batch_df.schema)
    index_reps = corpus.select(F.col("vec_id").alias("rep"), "embedding")
    if _hadoop_path_exists(spark, index_path):
        index_sigs = (
            spark.read.parquet(index_path)
            .join(batch_ids.withColumnRenamed("vec_id", "rep"), "rep", "left_anti")
        )
    else:
        index_sigs = embedding_band_index(
            index_reps, bits_per_band=bits_per_band, n_bands=n_bands, dim=dim
        ).localCheckpoint(eager=True)
        # Bootstrap with an externally-seeded corpus (corpus_path exists but
        # index_path does not): persist the corpus-derived signatures NOW,
        # not just the admitted batch's, or the next drain reads an index
        # that silently omits the seeded corpus and wrongly admits its
        # near-duplicates. Checkpointed first so the probe below and this
        # write share one materialization of the corpus scan.
        if not corpus.isEmpty():
            merge_batch_into(index_sigs, index_path, ["rep", "band"])
    mb, rb = collapse_exact_duplicates(batch_df)
    batch_sigs = embedding_band_index(
        rb, bits_per_band=bits_per_band, n_bands=n_bands, dim=dim
    )
    # Materialize verdicts BEFORE any merge overwrites the parquet this
    # plan reads (same discipline as admit_batch_into).
    verdicts = _admission_verdicts(
        mb, rb, batch_sigs, index_reps, index_sigs, threshold
    ).localCheckpoint(eager=True)
    admitted = batch_df.join(verdicts.filter("is_new").select("vec_id"), "vec_id")
    admitted_sigs = embedding_band_index(
        admitted.select(F.col("vec_id").alias("rep"), "embedding"),
        bits_per_band=bits_per_band,
        n_bands=n_bands,
        dim=dim,
    ).localCheckpoint(eager=True)
    merge_batch_into(admitted, corpus_path, ["vec_id"])
    merge_batch_into(admitted_sigs, index_path, ["rep", "band"])
    merge_batch_into(verdicts, verdicts_path, ["vec_id"])


def admit_embeddings_stream(
    emb_stream: DataFrame,
    corpus_path: str,
    index_path: str,
    verdicts_path: str,
    threshold: float = 0.9,
    bits_per_band: int = 4,
    n_bands: int = 4,
    dim: int = 4,
):
    """Continuous near-dup admission for embedding vectors: newly ingested
    (vec_id, embedding) rows stream through the persisted-band-index probe
    under ``Trigger.AvailableNow`` — the vector-modality counterpart of
    :func:`admit_documents_stream`, completing two-modality continuous
    ingest (text via the inverted shingle index, embeddings via the sign-LSH
    band index). Each drain admits only vectors with no cos ≥ threshold
    neighbor in the corpus-so-far or among earlier vectors of the same
    micro-batch; admitted vectors AND their band signatures merge into the
    persistent state, so the next drain's probe cost stays batch-bounded."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        admit_embedding_batch_into(
            batch_df,
            corpus_path,
            index_path,
            verdicts_path,
            threshold,
            bits_per_band=bits_per_band,
            n_bands=n_bands,
            dim=dim,
        )

    return (
        emb_stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .trigger(availableNow=True)
    )


def admit_documents_stream(
    doc_stream: DataFrame,
    corpus_path: str,
    verdicts_path: str,
    threshold: float = 0.8,
):
    """Continuous near-dup admission: newly ingested documents stream
    through the ``dedup_incremental_batch`` corpus-index probe under
    ``Trigger.AvailableNow`` — the incremental replacement for the
    reference's daily full refresh, composed from the foreachBatch MERGE
    sink and the batch admission operator. Each drain admits only documents
    that are not near-dups (Jaccard ≥ threshold on 3-token shingles) of the
    corpus-so-far or of an earlier doc in the same micro-batch; the
    checkpoint makes re-drains skip processed files, and replayed batches
    merge to identical state."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        admit_batch_into(batch_df, corpus_path, verdicts_path, threshold)

    return (
        doc_stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .trigger(availableNow=True)
    )
