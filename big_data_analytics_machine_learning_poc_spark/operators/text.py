"""Text-analysis operators over the ``documents`` table (BASELINE.json
north-star: language-ID, quality scoring, token counting, fingerprinting).

The reference's only text processing is MLlib Tokenizer/StopWordsRemover/
HashingTF/IDF chains (TfIdfCalculator.java:49-94, SpamClassification.java:
65-83); this module adds the training-data-pipeline analyses those chains
feed at 100 TB scale. Everything is built-in-function expressions (split/
regexp/higher-order array funcs) — JVM codegen, zero Python UDFs, embarrass-
ingly parallel per-document map work: no shuffle at any scale.

Every operator has an exact DuckDB oracle: identical tokenization regex,
identical integer arithmetic, ratios rounded identically.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.hashing import md5_hash60, md5_hash60_sql
from ..registry import QueryRegistry

REG = QueryRegistry()

# Tokenization shared by every operator here AND mirrored in each oracle.
# The whitespace class is EXPLICIT rather than \s because \s is a different
# character set per regex engine (Java \s includes \x0B, RE2's does not) —
# 'a\x0bb' would tokenize as 2 tokens in Spark and 1 in DuckDB, silently
# breaking every token-derived metric. Empty tokens are filtered on both
# sides so an empty/whitespace-only document has 0 tokens, not one ''
# token polluting counts, sketches, and vocabularies. Both properties are
# pinned by tests/test_text_dedup.py::test_tokenizer_cross_engine_parity.
TOKEN_RE = r"[ \t\n\r\f\x0B]+"


def tokens_col() -> Column:
    return F.filter(
        F.split(F.trim(F.col("text")), TOKEN_RE), lambda t: t != ""
    )


TOKENS_SQL = (
    r"list_filter(regexp_split_to_array(trim(text), '[ \t\n\r\f\x0B]+'),"
    " t -> t <> '')"
)

# Tiny function-word lexicons for the language heuristic. Deliberately small:
# the operator is a deterministic n-gram/stopword scorer, not a model.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is"),
    "fr": ("le", "la", "les", "et", "des", "une"),
    "es": ("el", "los", "las", "y", "una", "que"),
    "de": ("der", "die", "das", "und", "ein", "nicht"),
}
STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "is", "in", "it")

# Quality-gate thresholds — the ONE definition shared by text_quality's
# per-doc flag and corpus.py's keep predicate (corpus imports these), so
# retuning the gate cannot silently desynchronize the two.
QUALITY_MIN_TOKENS, QUALITY_MAX_TOKENS, QUALITY_MAX_STOPWORD_RATIO = 5, 500, 0.6


def _hits(lex: tuple[str, ...], toks: Column | None = None) -> Column:
    """Lexicon hit count. Pass a staged token column where possible — an
    inline tokens_col() re-evaluates the split regex inside the filter
    lambda per element (see dedup.bigram_shingles PERF note)."""
    if toks is None:
        toks = tokens_col()
    return F.size(F.filter(toks, lambda t: t.isin(*lex)))


def _hits_sql(lex: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in lex)
    return f"len(list_filter({TOKENS_SQL}, t -> t IN ({inlist})))"


@REG.add(
    "text_token_count",
    sql=f"""
    SELECT doc_id,
           len({TOKENS_SQL}) AS n_tokens,
           len(list_distinct({TOKENS_SQL})) AS n_distinct_tokens,
           LENGTH(text) AS n_chars_calc
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting (the BPE-ish regex variant is
    text_token_count_regex below)."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokens_col()).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tokens_col())).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars_calc"),
    )


@REG.add(
    "text_token_count_regex",
    sql=r"""
    SELECT doc_id,
           len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t != '')) AS n_word_tokens
    FROM documents
    """,
)
def text_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish word tokenization: split on non-alphanumerics, drop empties."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"[^a-z0-9]+"), lambda t: t != F.lit("")
    )
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(toks).cast("long").alias("n_word_tokens")
    )


@REG.add(
    "text_quality",
    sql=f"""
    SELECT doc_id,
           LENGTH(text) AS n_chars,
           len({TOKENS_SQL}) AS n_tokens,
           ROUND(CAST(list_sum(list_transform({TOKENS_SQL}, t -> LENGTH(t))) AS DOUBLE)
                 / NULLIF(len({TOKENS_SQL}), 0), 6) AS avg_token_len,
           ROUND(CAST({_hits_sql(STOPWORDS)} AS DOUBLE) / NULLIF(len({TOKENS_SQL}), 0), 6) AS stopword_ratio,
           CASE WHEN len({TOKENS_SQL}) BETWEEN {QUALITY_MIN_TOKENS} AND {QUALITY_MAX_TOKENS}
                 AND CAST({_hits_sql(STOPWORDS)} AS DOUBLE) / NULLIF(len({TOKENS_SQL}), 0) < {QUALITY_MAX_STOPWORD_RATIO}
                THEN 1 ELSE 0 END AS quality_flag
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length bounds, mean token length, stopword
    density — the standard pre-training corpus filters."""
    toks = F.col("__toks")  # staged (bigram_shingles PERF note)
    n_tokens = F.size(toks)
    tok_len_sum = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    stop_ratio = _hits(STOPWORDS, toks).cast("double") / F.nullif(n_tokens, F.lit(0))
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", tokens_col().alias("__toks"))
        .select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars"),
            n_tokens.cast("long").alias("n_tokens"),
            F.round(tok_len_sum.cast("double") / F.nullif(n_tokens, F.lit(0)), 6).alias("avg_token_len"),
            F.round(stop_ratio, 6).alias("stopword_ratio"),
            F.when(n_tokens.between(QUALITY_MIN_TOKENS, QUALITY_MAX_TOKENS) & (stop_ratio < QUALITY_MAX_STOPWORD_RATIO), 1).otherwise(0).alias("quality_flag"),
        )
    )


def _langid_sql() -> str:
    hits = {lang: _hits_sql(lex) for lang, lex in LANG_LEXICONS.items()}
    return f"""
    SELECT doc_id,
           CASE
             WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
             WHEN {hits['en']} = 0 AND {hits['fr']} = 0 AND {hits['es']} = 0 AND {hits['de']} = 0 THEN 'unknown'
             WHEN {hits['en']} >= {hits['fr']} AND {hits['en']} >= {hits['es']} AND {hits['en']} >= {hits['de']} THEN 'en'
             WHEN {hits['fr']} >= {hits['es']} AND {hits['fr']} >= {hits['de']} THEN 'fr'
             WHEN {hits['es']} >= {hits['de']} THEN 'es'
             ELSE 'de'
           END AS predicted_lang
    FROM documents
    """


@REG.add("text_lang_id", sql=_langid_sql())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic language heuristic: CJK codepoint check, then function-
    word hit counts with a fixed tie-break order (en > fr > es > de)."""
    # two staged projections: tokens once, then each lexicon hit count once —
    # the when-chain references every count up to 4 times, and inline they
    # would each re-run the tokenizing filter (bigram_shingles PERF note)
    staged = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", tokens_col().alias("__toks")
    )
    counted = staged.select(
        "doc_id",
        "text",
        *[
            _hits(lex, F.col("__toks")).alias(f"__h_{lang}")
            for lang, lex in LANG_LEXICONS.items()
        ],
    )
    h = {lang: F.col(f"__h_{lang}") for lang in LANG_LEXICONS}
    pred = (
        F.when(F.col("text").rlike("[一-鿿]"), "zh")
        .when((h["en"] == 0) & (h["fr"] == 0) & (h["es"] == 0) & (h["de"] == 0), "unknown")
        .when((h["en"] >= h["fr"]) & (h["en"] >= h["es"]) & (h["en"] >= h["de"]), "en")
        .when((h["fr"] >= h["es"]) & (h["fr"] >= h["de"]), "fr")
        .when(h["es"] >= h["de"], "es")
        .otherwise("de")
    )
    return counted.select("doc_id", pred.alias("predicted_lang"))


# explicit class, not \s: Java and RE2 \s disagree on \x0B (see TOKEN_RE)
_NORMALIZED_SQL = md5_hash60_sql(
    r"regexp_replace(trim(text), '[ \t\n\r\f\x0B]+', ' ', 'g')"
)


@REG.add(
    "text_fingerprint",
    sql=f"""
    SELECT doc_id,
           {_NORMALIZED_SQL} AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit whitespace-normalized document fingerprint (md5-based so it is
    stable across engines/releases — see functions/hashing.py)."""
    normalized = F.regexp_replace(F.trim(F.col("text")), TOKEN_RE, " ")
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", md5_hash60(normalized).alias("fingerprint")
    )


# --------------------------------------------------------------------------
# Scalar pandas_udf (Arrow-vectorized) — completes the UDF taxonomy next to
# mapInPandas (multimodal.py) and applyInPandasWithState (streaming/stateful).
# --------------------------------------------------------------------------


def _make_readability_udf():
    """Arrow-vectorized scalar UDF: a simple readability proxy
    (mean word length / (1 + type-token ratio)), computed per batch in
    pandas. Row-at-a-time Python UDFs are banned in this engine (SURVEY
    §2.11): this is the sanctioned Python scalar path. Built lazily —
    pandas_udf type resolution needs an active SparkSession."""
    from pyspark.sql.functions import pandas_udf

    from ..functions.exact import round_half_up

    @pandas_udf("double")
    def _readability_udf(texts: pd.Series) -> pd.Series:
        import re

        def score(t):
            if t is None:
                return None  # SQL semantics: NULL text -> NULL score
            toks = [w for w in re.split(TOKEN_RE, t.strip()) if w != ""]
            if not toks:
                return 0.0
            mean_len = sum(len(w) for w in toks) / len(toks)
            ttr = len(set(toks)) / len(toks)
            # round_half_up, NOT round(): the oracle ROUNDs half away from
            # zero; builtin banker's rounding forked on an exact-.5 score
            # at sf0.1 (functions/exact.py docstring has the case)
            return round_half_up(mean_len / (1.0 + ttr), 6)

        return texts.map(score)

    return _readability_udf


@REG.add(
    "text_readability_pandas_udf",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, {TOKENS_SQL} AS tk FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(tk) = 0 THEN 0.0 ELSE ROUND(
             (CAST(list_sum(list_transform(tk, t -> LENGTH(t))) AS DOUBLE) / len(tk))
             / (1.0 + CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk)), 6) END
             AS readability
    FROM toks
    """,
)
def text_readability_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""The pandas_udf runs the same integer/float arithmetic as the SQL
    oracle, tokenizing with the shared TOKEN_RE class (NULL text scores
    NULL, tokenless text 0.0 — on both sides), proving the Arrow
    scalar-UDF path end-to-end. Note: this op exists to exercise
    the UDF lane — text_quality computes comparable metrics fully JVM-side,
    which is the preferred shape when expressible."""
    docs = load_table(spark, sf_dir, "documents")
    udf = _make_readability_udf()
    return docs.select("doc_id", udf(F.col("text")).alias("readability"))


@REG.add(
    "text_rolling_hash",
    sql="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
                          list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 2147483647) AS rolling_hash
    FROM documents
    """,
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash document fingerprint (h = Σ c·31^i mod M31):
    the classic incremental fingerprint — unlike md5 it can be updated as a
    window slides over a stream of text. Folded left-to-right over unicode
    codepoints identically in both engines."""
    chars = F.split(F.col("text"), "")
    roll = F.aggregate(
        F.transform(chars, F.ascii),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % F.lit(2_147_483_647),
    )
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", roll.alias("rolling_hash")
    )


@REG.add(
    "text_stats_arrow",
    sql="""
    SELECT doc_id,
           LENGTH(text) AS n_chars_arrow,
           LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS n_spaces
    FROM documents
    """,
)
def text_stats_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow lane (the fifth and lowest-overhead Python lane, beside
    pandas_udf / mapInPandas / applyInPandas / applyInPandasWithState):
    operates on raw pyarrow RecordBatches with zero pandas conversion —
    the right lane when the Python work is itself Arrow-native (here
    pyarrow.compute string kernels, in production e.g. tokenizers or codecs
    that accept Arrow buffers directly)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(
                        pc.subtract(
                            pc.utf8_length(text),
                            pc.utf8_length(pc.replace_substring(text, " ", "")),
                        ),
                        pa.int64(),
                    ),
                ],
                names=["doc_id", "n_chars_arrow", "n_spaces"],
            )

    return load_table(spark, sf_dir, "documents").mapInArrow(
        stats, "doc_id long, n_chars_arrow long, n_spaces long"
    )


@REG.add(
    "text_udtf_tokens",
    sql=f"""
    SELECT doc_id,
           unnest(list_transform(range(1, len({TOKENS_SQL}) + 1),
                  i -> {{'pos': CAST(i - 1 AS BIGINT),
                         'token': ({TOKENS_SQL})[i]}}),
                  recursive := true)
    FROM documents WHERE doc_id < 100
    """,
)
def text_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF lane (Spark 4): a table function emitting (pos, token)
    rows per document through a SQL LATERAL join — the sixth Python
    execution surface next to pandas_udf / mapInPandas / applyInPandas /
    applyInPandasWithState / mapInArrow. The UDTF tokenizes with the SAME
    explicit whitespace class as tokens_col/TOKENS_SQL — Python's
    ``str.split()`` treats more codepoints as whitespace (\\x1c-\\x1f,
    \\x85, NBSP) and would silently diverge from the oracle on such text —
    so the oracle is the plain posexplode equivalent.

    Scale note: even Arrow-optimized (``useArrow=True`` — batched transfer,
    plans ArrowEvalPythonUDTF, plan-linted), a Python UDTF remains slower
    than pure JVM; registered for API completeness and a production token
    explode is the posexplode_first_tokens shape. The class is defined
    inside the function (no session at import time; lazy like the
    pandas_udf lanes)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: bigint, token: string", useArrow=True)
    class Tokens:
        def eval(self, text: str):
            import re

            if text is None:
                return
            toks = [t for t in re.split(TOKEN_RE, text.strip()) if t != ""]
            for i, t in enumerate(toks):
                yield i, t

    spark.udtf.register("tokens_udtf", Tokens)
    load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).select(
        "doc_id", "text"
    ).createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM docs_for_udtf d, LATERAL tokens_udtf(d.text) t
        """
    )


@REG.add(
    "udtf_dynamic_csv_parse",
    sql="""
    SELECT c_custkey, c_nationkey,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM customer WHERE c_custkey < 200 ORDER BY c_custkey
    """,
)
def udtf_dynamic_csv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()``): the output schema
    is not declared statically — the UDTF's static ``analyze`` method runs
    at ANALYSIS time, reads the constant schema-hint argument, and returns
    the output StructType, so one table function parses any delimited
    layout a caller names (the dynamic-schema half of the UDTF surface;
    ``text_udtf_tokens`` covers the static-schema half). The lane
    round-trips customer rows through a CSV encode -> dynamic-UDTF parse
    and must reproduce the source columns bit-exactly, which the oracle
    states directly off the table.

    Scale note: the parse is Arrow-batched per ANALYZE-resolved schema;
    like every Python surface it is the slow lane vs from_csv (JVM), and
    production parsing uses the native reader — the lane exists for the
    API surface and for formats no JVM parser speaks."""
    from pyspark.sql.functions import udtf

    # NB: StructType.fromDDL needs an active SparkContext, which the
    # analyze/eval WORKER processes don't have — the hint grammar is
    # parsed in pure Python ("name type, ..." with bigint/double/string)
    def _hint_fields(hint: str) -> list[tuple[str, str]]:
        out = []
        for part in hint.split(","):
            name, typ = part.strip().rsplit(" ", 1)
            if typ not in ("bigint", "double", "string"):
                raise ValueError(f"unsupported hint type {typ!r}")
            out.append((name.strip(), typ))
        return out

    @udtf(useArrow=True)
    class CsvParse:
        @staticmethod
        def analyze(line, hint):
            from pyspark.sql.functions import AnalyzeResult
            from pyspark.sql.types import (
                DoubleType,
                LongType,
                StringType,
                StructField,
                StructType,
            )

            if hint.value is None:
                raise ValueError("schema hint must be a constant string")
            types = {"bigint": LongType(), "double": DoubleType(), "string": StringType()}
            return AnalyzeResult(
                StructType(
                    [StructField(n, types[t]) for n, t in _hint_fields(hint.value)]
                )
            )

        def eval(self, line: str, hint: str):
            if line is None:
                return
            casts = {"bigint": int, "double": float, "string": str}
            yield tuple(
                casts[t](raw)
                for raw, (_n, t) in zip(line.split(","), _hint_fields(hint))
            )

    spark.udtf.register("csv_parse_udtf", CsvParse)
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    cust.select(
        F.concat_ws(
            ",",
            F.col("c_custkey"),
            F.col("c_nationkey"),
            F.round(F.col("c_acctbal") * 100).cast("long"),
        ).alias("line")
    ).createOrReplaceTempView("cust_csv_lines")
    return spark.sql(
        """
        SELECT t.c_custkey, t.c_nationkey, t.acctbal_cents
        FROM cust_csv_lines c,
        LATERAL csv_parse_udtf(
          c.line,
          'c_custkey bigint, c_nationkey bigint, acctbal_cents bigint') t
        ORDER BY t.c_custkey
        """
    )
