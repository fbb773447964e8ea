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

Append-only contract, same as Delta's streaming source: an ``overwrite``
snapshot inside the tailed range raises instead of silently replaying
rewritten rows — EXCEPT the table's very first snapshot (no
parent-snapshot-id), which is the initial load. Backpressure via
``maxSnapshotsPerTrigger`` mirrors ``maxCommitsPerTrigger``.

Scale shape: offset progression is O(new snapshots); planning a batch
reads only the manifests the new snapshot ADDED (``added_snapshot_id``
match), so tailing a 100 TB table costs its ingest rate, not its size.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql.datasource import DataSource, DataSourceStreamReader
from pyspark.sql.types import StructType

from . import avro_lite
from .iceberg_lite import _spark_schema, load_metadata
from .pyds import DeltaLiteInputPartition, _read_file_batches


def _pv_string(itype: str, v) -> str | None:
    """Typed manifest partition value → the hive string encoding
    ``_read_file_batches``/``_partition_value`` expect."""
    if v is None:
        return None
    if itype == "date":  # stored as epoch days in the partition tuple
        return (datetime.date(1970, 1, 1) + datetime.timedelta(days=v)).isoformat()
    if itype == "boolean":
        return "true" if v else "false"
    return str(v)


class IcebergLiteStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        table: str,
        starting_sequence: int = 0,
        max_snapshots_per_trigger: int | None = None,
    ):
        self.table = table
        self.starting_sequence = starting_sequence
        self.max_snaps = max_snapshots_per_trigger
        self._last_committed = starting_sequence
        meta = load_metadata(table)
        self.full_schema: StructType = _spark_schema(meta)

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
        out = []
        for snap in meta.get("snapshots", []):
            if not start["seq"] < snap["sequence-number"] <= end["seq"]:
                continue
            op = snap["summary"]["operation"]
            if op == "replace":
                # compaction: same rows in fewer files — already emitted
                # from the originals (delta's dataChange=false doctrine)
                continue
            if op != "append" and "parent-snapshot-id" in snap:
                raise RuntimeError(
                    f"iceberg_lite stream source is append-only: snapshot "
                    f"{snap['snapshot-id']} is an {op!r} (rewrites upstream of "
                    f"a streaming reader need a CDC-aware consumer)"
                )
            _, manifests = avro_lite.read_ocf(
                os.path.join(self.table, snap["manifest-list"])
            )
            for m in manifests:
                if m["added_snapshot_id"] != snap["snapshot-id"]:
                    continue  # carried forward from the parent — already emitted
                spec_fields = specs[m["partition_spec_id"]]
                _, entries = avro_lite.read_ocf(
                    os.path.join(self.table, m["manifest_path"])
                )
                for e in entries:
                    if e["status"] != 1:  # only files ADDED by this snapshot
                        continue
                    part = e["data_file"].get("partition") or {}
                    pv = {
                        pf["name"]: _pv_string(
                            field_types[pf["source-id"]], part.get(pf["name"])
                        )
                        for pf in spec_fields
                    }
                    out.append(
                        DeltaLiteInputPartition(
                            os.path.join(self.table, e["data_file"]["file_path"]), pv
                        )
                    )
        return out

    def read(self, partition: DeltaLiteInputPartition):
        yield from _read_file_batches(
            partition.file_path,
            self.full_schema.fieldNames(),
            list(partition.partition_values.keys()),
            partition.partition_values,
            self.full_schema,
        )

    def commit(self, end: dict) -> None:
        self._last_committed = end["seq"]


class IcebergLiteStreamDataSource(DataSource):
    """Options: ``startingSequence`` (exclusive; default 0 = from the
    initial load) and ``maxSnapshotsPerTrigger`` (backpressure)."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_lite_stream"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("iceberg_lite_stream requires a path: .load(<table dir>)")
        return _spark_schema(load_metadata(path))

    def streamReader(self, schema) -> IcebergLiteStreamReader:
        start = int(self.options.get("startingsequence", 0))
        ms = self.options.get("maxsnapshotspertrigger")
        return IcebergLiteStreamReader(
            self.options["path"],
            starting_sequence=start,
            max_snapshots_per_trigger=int(ms) if ms is not None else None,
        )
