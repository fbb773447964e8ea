"""Sources & sinks (SURVEY.md §2.1).

The reference reads CSVs two ways — header+inferSchema (TfIdfCalculator.java:
33-36, DataCorrelator.java:31-33, RandomForest.java:31-34) and header-only
all-string (SpamClassification.java:38-39) — and has NO sink but show().
This module keeps both read shapes (inference for parity, explicit schema for
production: inference is an extra full pass over the data) and adds real
sinks: partitioned/bucketed parquet.
"""

from .csv import read_csv_all_string, read_csv_inferred, read_csv_schema
from .media import ingest_media_dir, read_binary_files, write_media_parquet
from .sinks import read_orc, write_bucketed_table, write_orc, write_partitioned_parquet
from .synthdocs import synth_docs, synth_docs_jvm

__all__ = [
    "ingest_media_dir",
    "read_binary_files",
    "read_orc",
    "write_media_parquet",
    "write_orc",
    "read_csv_all_string",
    "synth_docs",
    "synth_docs_jvm",
    "read_csv_inferred",
    "read_csv_schema",
    "write_bucketed_table",
    "write_partitioned_parquet",
]
