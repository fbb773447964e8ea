"""Structured Streaming FROM an iceberg_lite table (Python Data Source).

``spark.readStream.format("iceberg_lite_stream").load(table)`` tails the
snapshot log the way ``delta_lite_stream`` (sources/pyds.py) tails the
Delta commit log: offsets are snapshot SEQUENCE NUMBERS (spec-guaranteed
strictly increasing), each micro-batch plans one input partition per data
file ADDED by the snapshots in (start, end] — read straight from the new
manifests, no directory LIST — and executors stream the parquet as Arrow
batches through the same ``_read_file_batches`` core as the Delta
connector (so schema-evolution null-fill and typed partition constants
cannot diverge between the two lakehouse tails).

Two modes:

- **Append-only** (default), same contract as Delta's streaming source:
  an ``overwrite`` snapshot inside the tailed range raises instead of
  silently replaying rewritten rows — EXCEPT the table's very first
  snapshot (no parent-snapshot-id), which is the initial load.
- **Changelog** (``option("changelog", "true")``, VERDICT r10 ask #2):
  the output gains ``_change_type`` ('insert' | 'delete') and
  ``_commit_seq`` columns, and DML snapshots emit change rows instead of
  raising: added data files → inserts; added position-delete files → the
  ADDRESSED rows re-read by (file, pos) as delete pre-images; added
  equality-delete files → KEY-ONLY delete rows (non-key columns null) —
  the Flink-CDC upsert shape, O(change) with no older-file scan; a
  consumer materializes by key. Full pre-images for equality deletes need
  a table scan — use the batch ``iceberg_lite.iceberg_table_changes`` for
  that. A FULL overwrite (one that drops its parent's files) still
  raises: replaying it means re-reading the whole removed snapshot, which
  is a batch job, not a tail.

Backpressure via ``maxSnapshotsPerTrigger`` mirrors
``maxCommitsPerTrigger``.

Scale shape: offset progression is O(new snapshots); planning a batch
reads only the manifests the new snapshot ADDED (``added_snapshot_id``
match), so tailing a 100 TB table costs its ingest rate, not its size.
Changelog partitions carry only file paths + O(files) partition-value
constants; the addressed-row reads happen executor-side in Arrow.
"""

from __future__ import annotations

import datetime
import os
from dataclasses import dataclass, field

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition
from pyspark.sql.types import LongType, StringType, StructField, StructType

from . import avro_lite
from .iceberg_lite import (
    _physical_names,
    _resolve,
    _spark_schema,
    _transform_result_type,
    load_metadata,
)
from .pyds import DeltaLiteInputPartition, _read_file_batches


def _pv_string(itype: str, v) -> str | None:
    """Typed manifest partition value → the hive string encoding
    ``_read_file_batches``/``_partition_value`` expect. ``itype`` is the
    transform RESULT type (epoch-day ints render as ISO dates)."""
    if v is None:
        return None
    if itype == "date":  # stored as epoch days in the partition tuple
        return (datetime.date(1970, 1, 1) + datetime.timedelta(days=v)).isoformat()
    if itype == "boolean":
        return "true" if v else "false"
    return str(v)


@dataclass
class IcebergChangePartition(InputPartition):
    """A changelog input partition: ``kind`` selects the executor-side
    read strategy. ``pos_delete`` carries the delete file plus each target
    data file's identity partition values (the planner has them from the
    manifests; executors must not re-read metadata)."""

    kind: str  # "insert" | "pos_delete" | "eq_delete"
    file_path: str
    seq: int
    partition_values: dict = field(default_factory=dict)
    target_pv: dict = field(default_factory=dict)  # pos_delete: file -> pv
    key_names: tuple = ()  # eq_delete: the key column names


class IcebergLiteStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        table: str,
        starting_sequence: int = 0,
        max_snapshots_per_trigger: int | None = None,
        changelog: bool = False,
    ):
        self.table = table
        self.starting_sequence = starting_sequence
        self.max_snaps = max_snapshots_per_trigger
        self.changelog = changelog
        self._last_committed = starting_sequence
        meta = load_metadata(table)
        self.full_schema: StructType = _spark_schema(meta)
        # logical -> PHYSICAL parquet names for the pinned schema (files
        # and hive dirs keep a field's creation name across renames —
        # iceberg_lite's name-mapping doctrine); identity until the first
        # rename_column, so pre-rename tables pay nothing
        self.phys: dict[str, str] = _physical_names(meta)

    def initialOffset(self) -> dict:
        # exclusive: the first batch starts AFTER this sequence number
        # (default 0 = replay from the initial load)
        return {"seq": self.starting_sequence}

    def latestOffset(self) -> dict:
        latest = load_metadata(self.table)["last-sequence-number"]
        if self.max_snaps is not None:
            # backpressure: a catch-up after a bulk backfill advances at
            # most N snapshots per micro-batch; commit() keeps progress
            # monotone so nothing is skipped
            latest = min(latest, self._last_committed + self.max_snaps)
        return {"seq": latest}

    def partitions(self, start: dict, end: dict):
        # floor the pacing state with the TRUE batch start (query
        # checkpoint) so a restarted planning worker cannot regress
        # latestOffset below the checkpointed offset
        self._last_committed = max(self._last_committed, start["seq"])
        meta = load_metadata(self.table)
        field_types = {}
        for s in meta["schemas"]:
            for f in s["fields"]:
                if isinstance(f["type"], str):
                    field_types[f["id"]] = f["type"]
        fid_to_name = {}
        for s in meta["schemas"]:
            for f in s["fields"]:
                fid_to_name[f["id"]] = f["name"]
        specs = {sp["spec-id"]: sp["fields"] for sp in meta["partition-specs"]}
        # loud on retention gaps: sequence numbers are dense (one per
        # snapshot), so any seq in (start, end] missing from the metadata
        # was expired out from under the tail — emitting only the
        # survivors would silently lose the expired snapshots' rows (the
        # Delta tail gets this for free as a FileNotFoundError on the
        # vacuumed commit JSON)
        have_seqs = {s["sequence-number"] for s in meta.get("snapshots", [])}
        missing = set(range(start["seq"] + 1, end["seq"] + 1)) - have_seqs
        if missing:
            # expired `replace` (compaction) snapshots carried no data
            # change — the tail would have skipped them anyway, so their
            # expiry loses nothing (recorded by expire_snapshots)
            import json as _json

            from .iceberg_lite import _EXPIRED_REPLACE_KEY

            harmless = set(
                _json.loads(
                    meta.get("properties", {}).get(_EXPIRED_REPLACE_KEY, "[]")
                )
            )
            missing -= harmless
        if missing:
            lowest_live = min(have_seqs) if have_seqs else end["seq"]
            raise RuntimeError(
                f"iceberg_lite stream: snapshots with sequence numbers "
                f"{sorted(missing)} were expired before the tail read them "
                f"(expire_snapshots outran the stream); their rows cannot be "
                f"replayed — restart with "
                f"option('startingSequence', {max(lowest_live - 1, 0)}) to "
                f"tail from the oldest retained snapshot, or raise the "
                f"retention window"
            )

        to_logical = {v: k for k, v in self.phys.items()}

        def identity_pv(spec_fields, part):
            # hidden-partition (transform) fields are DERIVED — the source
            # column lives in the data file itself, so only identity
            # fields become typed constants; values render under the
            # transform's RESULT type (epoch-day ints → ISO dates). Spec
            # field names are PHYSICAL; the executor works in logical
            # column space, so remap here (identity unless renamed)
            pv = {}
            for pf in spec_fields:
                if pf["transform"] != "identity":
                    continue
                pv[to_logical.get(pf["name"], pf["name"])] = _pv_string(
                    _transform_result_type(
                        pf["transform"], field_types[pf["source-id"]]
                    ),
                    part.get(pf["name"]),
                )
            return pv

        out = []
        for snap in meta.get("snapshots", []):
            seq = snap["sequence-number"]
            if not start["seq"] < seq <= end["seq"]:
                continue
            op = snap["summary"]["operation"]
            if op == "replace":
                # compaction: same rows in fewer files — already emitted
                # from the originals (delta's dataChange=false doctrine)
                continue
            is_dml = op != "append" and "parent-snapshot-id" in snap
            if is_dml and not self.changelog:
                raise RuntimeError(
                    f"iceberg_lite stream source is append-only: snapshot "
                    f"{snap['snapshot-id']} is an {op!r} — tail with "
                    f"option('changelog', 'true') for a CDC-aware read, or "
                    f"keep rewrites out of streamed tables"
                )
            _, manifests = avro_lite.read_ocf(
                _resolve(self.table, snap["manifest-list"])
            )
            # a FULL overwrite drops parent files: every prior manifest is
            # absent (all manifests added by this snapshot) while a parent
            # exists — its removed rows cannot be tailed, changelog or not
            if (
                is_dml
                and self.changelog
                and all(
                    m["added_snapshot_id"] == snap["snapshot-id"] for m in manifests
                )
            ):
                raise RuntimeError(
                    f"iceberg_lite stream: snapshot {snap['snapshot-id']} is a "
                    f"FULL overwrite — its removed rows are a batch replay, "
                    f"not a tail; use iceberg_lite.iceberg_table_changes"
                )
            snap_parts = []
            pos_parts: list[IcebergChangePartition] = []
            for m in manifests:
                if m["added_snapshot_id"] != snap["snapshot-id"]:
                    continue  # carried forward from the parent — already emitted
                spec_fields = specs[m["partition_spec_id"]]
                _, entries = avro_lite.read_ocf(
                    _resolve(self.table, m["manifest_path"])
                )
                for e in entries:
                    if e["status"] != 1:  # only files ADDED by this snapshot
                        continue
                    dfile = e["data_file"]
                    path = _resolve(self.table, dfile["file_path"])
                    if m["content"] == 0:  # data file → inserts
                        pv = identity_pv(spec_fields, dfile.get("partition") or {})
                        if self.changelog:
                            snap_parts.append(
                                IcebergChangePartition(
                                    "insert", path, seq, partition_values=pv
                                )
                            )
                        else:
                            snap_parts.append(DeltaLiteInputPartition(path, pv))
                    elif dfile["content"] == 2:  # equality deletes → keys
                        ids = dfile.get("equality_ids") or []
                        snap_parts.append(
                            IcebergChangePartition(
                                "eq_delete",
                                path,
                                seq,
                                key_names=tuple(fid_to_name[i] for i in ids),
                            )
                        )
                    else:  # position deletes → addressed pre-images
                        p = IcebergChangePartition("pos_delete", path, seq)
                        pos_parts.append(p)
                        snap_parts.append(p)
            if pos_parts:
                # target-file pv map (planner-side, from the carried
                # manifests; executors never read metadata) — built
                # LAZILY, only when this snapshot actually added position
                # deletes (review r11 #3), and PRUNED to each delete
                # file's ACTUAL target paths (VERDICT r11 #6 / ADVICE:
                # InputPartitions pickle per-partition to executors, so a
                # snapshot-wide map ships O(table-data-files) metadata per
                # delete partition — task payloads must scale with the
                # CHANGE, not the table). The distinct file_path column of
                # a pos-delete file is O(change) to read here.
                import pyarrow.parquet as _pq

                targets_of: dict[str, set] = {}
                wanted: set = set()
                for p in pos_parts:
                    # dedup ARROW-side: to_pylist() on the raw column
                    # would build O(deleted rows) Python strings on the
                    # driver; unique() keeps it at O(distinct targets)
                    t = set(
                        _pq.read_table(p.file_path, columns=["file_path"])
                        .column("file_path")
                        .unique()
                        .to_pylist()
                    )
                    targets_of[p.file_path] = t
                    wanted |= t
                all_data_pv: dict[str, dict] = {}
                for m in manifests:
                    if m["content"] != 0:
                        continue
                    spec_fields = specs[m["partition_spec_id"]]
                    _, dentries = avro_lite.read_ocf(
                        _resolve(self.table, m["manifest_path"])
                    )
                    for e in dentries:
                        if e["status"] == 2:
                            continue
                        path2 = _resolve(self.table, e["data_file"]["file_path"])
                        if path2 in wanted:
                            all_data_pv[path2] = identity_pv(
                                spec_fields, e["data_file"].get("partition") or {}
                            )
                for p in pos_parts:
                    # a target absent from the manifests stays absent here
                    # so the executor-side URI-mismatch raise stays loud
                    p.target_pv = {
                        t: all_data_pv[t]
                        for t in targets_of[p.file_path]
                        if t in all_data_pv
                    }
            out.extend(snap_parts)
        return out

    def read(self, partition):
        if not self.changelog:
            yield from _read_file_batches(
                partition.file_path,
                self.full_schema.fieldNames(),
                list(partition.partition_values.keys()),
                partition.partition_values,
                self.full_schema,
                (),
                self.phys,
            )
            return
        yield from _read_change_batches(partition, self.full_schema, self.phys)

    def commit(self, end: dict) -> None:
        self._last_committed = end["seq"]


def _changelog_schema(table_schema: StructType) -> StructType:
    # ALL table columns go nullable: an equality-delete change row carries
    # only its key columns (Flink-CDC shape), nulls elsewhere — even where
    # the table schema says required
    return StructType(
        [StructField(f.name, f.dataType, True) for f in table_schema.fields]
        + [
            StructField("_change_type", StringType(), False),
            StructField("_commit_seq", LongType(), False),
        ]
    )


def _read_change_batches(
    partition: IcebergChangePartition, schema: StructType, phys: dict | None = None
):
    """Executor-side changelog read: every yielded Arrow batch is shaped
    (table columns + _change_type + _commit_seq). ``insert`` streams the
    data file; ``pos_delete`` reads the delete file, groups addresses by
    target, and re-reads exactly the addressed rows; ``eq_delete`` emits
    key-only delete rows (Flink-CDC upsert shape). ``phys`` maps logical
    column names to the files' physical ones (identity unless
    rename_column ran)."""
    phys = phys or {}
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_type

    def stamp(batch: pa.RecordBatch, ctype: str) -> pa.RecordBatch:
        n = batch.num_rows
        arrays = list(batch.columns) + [
            pa.array([ctype] * n, type=pa.string()),
            pa.array([partition.seq] * n, type=pa.int64()),
        ]
        names = list(batch.schema.names) + ["_change_type", "_commit_seq"]
        return pa.RecordBatch.from_arrays(arrays, names=names)

    if partition.kind == "insert":
        for batch in _read_file_batches(
            partition.file_path,
            schema.fieldNames(),
            list(partition.partition_values.keys()),
            partition.partition_values,
            schema,
            (),
            phys,
        ):
            yield stamp(batch, "insert")
        return

    if partition.kind == "pos_delete":
        dels = pq.read_table(partition.file_path).to_pydict()
        by_target: dict[str, list[int]] = {}
        for f, p in zip(dels["file_path"], dels["pos"]):
            by_target.setdefault(f, []).append(p)
        for target, positions in sorted(by_target.items()):
            if target not in partition.target_pv:
                # URI-normalization miss: null-ing the identity partition
                # columns would emit silently wrong change rows — the same
                # failure class _attach_data_seq raises on (review r11 #4)
                raise RuntimeError(
                    f"iceberg_lite changelog: position-delete target "
                    f"{target!r} is missing from the planner's file map — "
                    f"URI normalization mismatch; refusing to emit "
                    f"pre-images with nulled partition columns"
                )
            pv = partition.target_pv[target]
            want = set(positions)
            row0 = 0
            for batch in _read_file_batches(
                target, schema.fieldNames(), list(pv.keys()), pv, schema, (), phys
            ):
                n = batch.num_rows
                hits = [i for i in range(n) if (row0 + i) in want]
                if hits:
                    yield stamp(batch.take(pa.array(hits, type=pa.int64())), "delete")
                row0 += n
        return

    if partition.kind == "eq_delete":
        missing_keys = set(partition.key_names) - {f.name for f in schema.fields}
        if missing_keys:
            # a delete keyed on a since-DROPPED column cannot be emitted
            # as a key-only row under the current schema — nulling the
            # key component would make the consumer match on the
            # surviving columns alone (the batch paths raise the same
            # way; review r12 #1's stream twin)
            raise RuntimeError(
                f"iceberg_lite changelog: equality delete "
                f"{partition.file_path} is keyed on column(s) "
                f"{sorted(missing_keys)} not present in the read schema "
                f"(dropped?); refusing to emit a narrowed key"
            )
        keys = pq.read_table(partition.file_path)
        n = keys.num_rows
        arrays, names = [], []
        for f in schema.fields:
            names.append(f.name)
            if f.name in partition.key_names:
                # key files carry PHYSICAL column names
                col = keys.column(phys.get(f.name, f.name)).combine_chunks()
                arrays.append(col.cast(to_arrow_type(f.dataType)))
            else:
                arrays.append(pa.nulls(n, type=to_arrow_type(f.dataType)))
        yield stamp(pa.RecordBatch.from_arrays(arrays, names=names), "delete")
        return

    raise ValueError(f"unknown changelog partition kind {partition.kind!r}")


class IcebergLiteStreamDataSource(DataSource):
    """Options: ``startingSequence`` (exclusive; default 0 = from the
    initial load), ``maxSnapshotsPerTrigger`` (backpressure), and
    ``changelog`` ('true' adds _change_type/_commit_seq and accepts DML
    snapshots in the tailed range)."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_lite_stream"

    def _changelog(self) -> bool:
        return str(self.options.get("changelog", "false")).lower() == "true"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("iceberg_lite_stream requires a path: .load(<table dir>)")
        base = _spark_schema(load_metadata(path))
        return _changelog_schema(base) if self._changelog() else base

    def streamReader(self, schema) -> IcebergLiteStreamReader:
        start = int(self.options.get("startingsequence", 0))
        ms = self.options.get("maxsnapshotspertrigger")
        return IcebergLiteStreamReader(
            self.options["path"],
            starting_sequence=start,
            max_snapshots_per_trigger=int(ms) if ms is not None else None,
            changelog=self._changelog(),
        )
