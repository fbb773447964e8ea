"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API): a
deterministic synthetic-documents generator.

Why an engine needs this: scale/regression testing a 100 TB pipeline
shouldn't require 100 TB of storage. A generator source produces
documents-shaped rows (the `documents` table contract: doc_id, text, lang,
source, n_chars) at any requested row count, split across any number of
input partitions, with content that is a pure function of (seed, doc_id) —
so two runs, two clusters, or two partition layouts produce identical rows.

Scale shape: ``partitions()`` returns N independent row-ranges; each task
generates only its own range (no driver materialization, no shuffle, memory
O(1) per row via a Python generator). Spark parallelizes one task per
InputPartition, so throughput scales linearly with executors — exactly how
a real TB-scale synthetic-load source must behave. Python-side generation
is the slow lane per-core (~100k rows/s/core) — fine for a load generator,
and the honest alternative (range() + JVM expressions) is documented in
``synth_docs_jvm`` below for when generation speed itself matters.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pyspark>=4 always has this; guard for portability of the module
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover
    HAVE_DATASOURCE_API = False
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceReader = object  # type: ignore[assignment,misc]

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor"
).split()
_LANGS = ("en", "de", "fr", "es")


def _doc_text(seed: int, doc_id: int) -> str:
    """Deterministic word-salad: md5-driven word picks, 8-40 words."""
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    n_words = 8 + h[0] % 33
    words = []
    state = h
    while len(words) < n_words:
        for b in state:
            words.append(_WORDS[b % len(_WORDS)])
            if len(words) == n_words:
                break
        state = hashlib.md5(state).digest()
    return " ".join(words)


class _Range(InputPartition if HAVE_DATASOURCE_API else object):
    def __init__(self, start: int, end: int, seed: int) -> None:
        self.start, self.end, self.seed = start, end, seed


class SynthDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self):  # noqa: D102 — API contract
        per = -(-self.n_rows // self.n_parts)  # ceil
        return [
            _Range(lo, min(lo + per, self.n_rows), self.seed)
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: "_Range"):  # noqa: D102 — API contract
        for doc_id in range(partition.start, partition.end):
            text = _doc_text(partition.seed, doc_id)
            yield (
                doc_id,
                text,
                _LANGS[doc_id % len(_LANGS)],
                f"src{doc_id % 20}",
                len(text),
            )


class SynthDocsDataSource(DataSource):
    """``spark.read.format("synthdocs").option("rows", N).load()``."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string, source string, n_chars bigint"

    def reader(self, schema) -> SynthDocsReader:  # noqa: D102 — API contract
        return SynthDocsReader(self.options)


def register(spark: SparkSession) -> None:
    """Idempotently register the source with this session."""
    spark.dataSource.register(SynthDocsDataSource)


def synth_docs(
    spark: SparkSession, rows: int, partitions: int = 8, seed: int = 42
) -> DataFrame:
    register(spark)
    return (
        spark.read.format("synthdocs")
        .option("rows", rows)
        .option("partitions", partitions)
        .option("seed", seed)
        .load()
    )


def synth_docs_jvm(spark: SparkSession, rows: int, partitions: int = 8) -> DataFrame:
    """The JVM fast lane: same shape via ``spark.range`` + codegen'd
    expressions (md5-derived pseudo-text, much shorter). Use when the
    generator itself must run at scan speed; content differs from the
    Python source by design (both are deterministic)."""
    return spark.range(0, rows, 1, partitions).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("text"),
        F.element_at(
            F.array(*[F.lit(x) for x in _LANGS]), (F.col("id") % 4 + 1).cast("int")
        ).alias("lang"),
        F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias("source"),
        F.lit(32).cast("long").alias("n_chars"),
    )


# ------------------------------------------------------------- streaming lane
if HAVE_DATASOURCE_API:
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class SynthDocsStreamReader(SimpleDataSourceStreamReader):
        """Offset = next doc_id. Batches are deterministic row-ranges, so
        replay after failure (``readBetweenOffsets``) regenerates byte-equal
        rows — the property exactly-once sinks need from a source."""

        def __init__(self, options: dict) -> None:
            self.batch = int(options.get("rows_per_batch", 100))
            self.max_rows = int(options.get("max_rows", 1000))
            self.seed = int(options.get("seed", 42))

        def initialOffset(self) -> dict:
            return {"offset": 0}

        def _rows(self, start: int, end: int):
            # materialized (not a generator): the engine's prefetch cache
            # copies the returned iterator, which a generator can't survive.
            # Bounded by rows_per_batch, so memory stays micro-batch-sized.
            out = []
            for doc_id in range(start, end):
                text = _doc_text(self.seed, doc_id)
                out.append(
                    (
                        doc_id,
                        text,
                        _LANGS[doc_id % len(_LANGS)],
                        f"src{doc_id % 20}",
                        len(text),
                    )
                )
            return out

        def read(self, start: dict):
            lo = start["offset"]
            hi = min(lo + self.batch, self.max_rows)
            return iter(self._rows(lo, hi)), {"offset": hi}

        def readBetweenOffsets(self, start: dict, end: dict):
            return iter(self._rows(start["offset"], end["offset"]))

    class SynthDocsStreamDataSource(DataSource):
        """``spark.readStream.format("synthdocs_stream")`` — a bounded,
        deterministic micro-batch generator (a seeded, replayable cousin of
        the built-in ``rate`` source, emitting the documents contract)."""

        @classmethod
        def name(cls) -> str:
            return "synthdocs_stream"

        def schema(self) -> str:
            return (
                "doc_id bigint, text string, lang string, "
                "source string, n_chars bigint"
            )

        def simpleStreamReader(self, schema) -> SynthDocsStreamReader:
            return SynthDocsStreamReader(self.options)

    def register_stream(spark: SparkSession) -> None:
        spark.dataSource.register(SynthDocsStreamDataSource)

    def synth_docs_stream(
        spark: SparkSession,
        max_rows: int = 1000,
        rows_per_batch: int = 100,
        seed: int = 42,
    ) -> DataFrame:
        register_stream(spark)
        return (
            spark.readStream.format("synthdocs_stream")
            .option("max_rows", max_rows)
            .option("rows_per_batch", rows_per_batch)
            .option("seed", seed)
            .load()
        )
