"""Randomized lifecycle fuzzer for iceberg_lite (VERDICT r9 ask #3).

Three successive review passes each found real defects in the
evolve/compact/expire/stream interplay (r9 commits: schema-pin crash
after add_column, expired-replace wedging a stream, replace-mode bypass,
fragmented-partition no-op). This test drives ≥100 seeded random
interleavings of append / add_column / delete_where / update_where /
compact / expire_snapshots / stream-tail against an in-memory model of
expected logical rows, snapshot history and stream offsets — the
``tests/test_avro_properties.py`` doctrine applied to table lifecycle.

Two independent verification paths:

- ``_pyarrow_read``: a from-scratch reader over ``plan_scan``'s ledger —
  pyarrow parquet decode, hive-dir partition rederivation, schema
  null-fill and position-delete application are all REIMPLEMENTED here,
  sharing nothing with ``read_iceberg``'s Spark anti-join, so agreement
  is evidence, not tautology. Runs after every mutating op (cheap: no
  Spark job).
- one ``read_iceberg`` (Spark) check per sequence, so the distributed
  anti-join path is also exercised against the model.

The stream-tail model asserts BOTH branches: a clean range must yield
exactly the appended rows; a range containing a DML snapshot or an
expired non-replace snapshot must raise (append-only / retention-gap
contracts of sources/pyds_iceberg.py).

Seed tiers: every seed is deterministic. The always-on tier keeps the
suite fast; ``ICEBERG_FUZZ_FULL=1`` runs the full 100 (the round-close
battery does — see COVERAGE.md r10 for the recorded green run).
"""

from __future__ import annotations

import os
import random
import shutil
import tempfile

import pytest
from pyspark.sql import types as T

from big_data_analytics_machine_learning_poc_spark.sources.iceberg_lite import (
    add_column,
    evolve_partition_spec,
    rename_column,
    compact_iceberg,
    delete_where,
    expire_snapshots,
    load_metadata,
    plan_scan,
    read_iceberg,
    update_where,
    upsert_by_key,
    write_iceberg,
)
from big_data_analytics_machine_learning_poc_spark.sources.pyds_iceberg import (
    IcebergLiteStreamReader,
)

# ---------------------------------------------------------------------------
# independent reader: pyarrow over the plan ledger (no read_iceberg code)
# ---------------------------------------------------------------------------


def _hive_partition_values(path: str, table: str) -> dict[str, str]:
    rel = os.path.relpath(path, os.path.join(table, "data"))
    out = {}
    for seg in rel.split(os.sep)[:-1]:
        if "=" in seg:
            k, v = seg.split("=", 1)
            out[k] = v
    return out


def _pyarrow_read(table: str, snapshot_id: int | None = None) -> set[tuple]:
    """Logical rows as a set of value tuples in schema order, computed
    WITHOUT read_iceberg: raw parquet decode + hive-dir partition values +
    null-fill + position-delete application (max delete seq per (file,
    pos), applied where data_seq <= delete_seq)."""
    import pyarrow.parquet as pq

    plan = plan_scan(table, snapshot_id=snapshot_id)
    # logical -> physical parquet names (identity until rename_column)
    phys = plan.get("physical_by_name") or {}
    deleted: dict[tuple[str, int], int] = {}
    for dpath, dseq in plan["delete_files"]:
        t = pq.read_table(dpath)
        for fp, pos in zip(
            t.column("file_path").to_pylist(), t.column("pos").to_pylist()
        ):
            key = (fp, pos)
            deleted[key] = max(deleted.get(key, dseq), dseq)
    # equality deletes: key tuple -> max delete seq per key-column set
    eq_deleted: dict[tuple[str, ...], dict[tuple, int]] = {}
    for dpath, dseq, names in plan["eq_delete_files"]:
        t = pq.read_table(dpath)
        cols = [t.column(phys.get(n, n)).to_pylist() for n in names]
        bucket = eq_deleted.setdefault(names, {})
        for key in zip(*cols):
            bucket[key] = max(bucket.get(key, dseq), dseq)
    schema: T.StructType = plan["schema"]
    rows: set[tuple] = set()
    for f in plan["files"]:
        t = pq.read_table(f)
        file_cols = set(t.column_names)
        pvals = _hive_partition_values(f, table)
        data_seq = plan["file_seqs"][f]
        n = t.num_rows
        cols_data = {c: t.column(c).to_pylist() for c in t.column_names}
        for pos in range(n):
            dseq = deleted.get((f, pos))
            if dseq is not None and data_seq <= dseq:
                continue
            eq_dead = False
            for names, bucket in eq_deleted.items():
                key = tuple(
                    cols_data[phys.get(nm, nm)][pos]
                    if phys.get(nm, nm) in file_cols
                    else (
                        int(pvals[phys.get(nm, nm)])
                        if phys.get(nm, nm) in pvals
                        and pvals[phys.get(nm, nm)].lstrip("-").isdigit()
                        else pvals.get(phys.get(nm, nm))
                    )
                    for nm in names
                )
                ks = bucket.get(key)
                if ks is not None and data_seq < ks:  # STRICTLY below
                    eq_dead = True
                    break
            if eq_dead:
                continue
            vals = []
            for field in schema.fields:
                pname = phys.get(field.name, field.name)
                if pname in file_cols:
                    vals.append(cols_data[pname][pos])
                elif pname in pvals:
                    v = pvals[pname]
                    vals.append(int(v) if v.lstrip("-").isdigit() else v)
                else:
                    vals.append(None)  # post-evolution null-fill
            rows.add(tuple(vals))
    return rows


# ---------------------------------------------------------------------------
# the model
# ---------------------------------------------------------------------------


class _Model:
    """Expected logical state: current rows (id -> dict), column list,
    per-sequence commit log for the stream model, snapshot history for
    time travel, and the set of expired sequence numbers."""

    def __init__(self) -> None:
        self.cols: list[str] = ["id", "bucket", "v"]
        self.rows: dict[int, dict] = {}
        self.next_id = 0
        # seq -> ("append"|"overwrite"|"delete"|"replace", [row tuples appended])
        self.seq_ops: dict[int, tuple[str, list[tuple]]] = {}
        self.expired: set[int] = set()
        # parent seqs of spec-changing FULL overwrites: if such a parent
        # expires, the changelog cannot derive the overwrite's removed
        # rows and must raise (r12)
        self.fullover_parent_seqs: list[int] = []
        # snap_id -> (seq, cols snapshot, frozenset of row tuples)
        self.snaps: dict[int, tuple[int, list[str], frozenset]] = {}
        self.live_snap_ids: set[int] = set()

    def tuples(self) -> set[tuple]:
        return {
            tuple(r.get(c) for c in self.cols) for r in self.rows.values()
        }

    def record_snapshot(self, snap_id: int, seq: int, op: str, added: list[tuple]):
        self.seq_ops[seq] = (op, added)
        self.snaps[snap_id] = (seq, list(self.cols), frozenset(self.tuples()))
        self.live_snap_ids.add(snap_id)


def _fresh_rows(model: _Model, rng: random.Random, n: int) -> list[dict]:
    out = []
    for _ in range(n):
        rid = model.next_id
        model.next_id += 1
        row = {"id": rid, "bucket": rid % 3, "v": rng.randrange(1000)}
        for c in model.cols[3:]:
            row[c] = rng.randrange(100)
        out.append(row)
    return out


def _spark_frame(spark, model: _Model, rows: list[dict]):
    fields = [
        T.StructField("id", T.LongType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("v", T.LongType()),
    ] + [T.StructField(c, T.LongType()) for c in model.cols[3:]]
    data = [tuple(r.get(c) for c in model.cols) for r in rows]
    return spark.createDataFrame(data, T.StructType(fields)).coalesce(1)


def _check_tail(table: str, model: _Model, offset: int) -> int:
    """Assert the stream-tail contract for the range (offset, latest] and
    return the new offset (unchanged when the tail must raise)."""
    meta = load_metadata(table)
    latest = meta["last-sequence-number"]
    if latest <= offset:
        return offset
    rng_seqs = range(offset + 1, latest + 1)
    gap = any(
        s in model.expired and model.seq_ops[s][0] != "replace" for s in rng_seqs
    )
    # the very first snapshot (seq 1, parentless) is the allowed initial load
    dml = any(
        model.seq_ops[s][0] in ("delete", "overwrite") and s != 1 for s in rng_seqs
    )
    reader = IcebergLiteStreamReader(table, starting_sequence=offset)
    if gap or dml:
        with pytest.raises(RuntimeError):
            reader.partitions({"seq": offset}, reader.latestOffset())
        return offset
    parts = reader.partitions({"seq": offset}, reader.latestOffset())
    got: list[tuple] = []
    for p in parts:
        for batch in reader.read(p):
            cols = {n: batch.column(i).to_pylist() for i, n in enumerate(batch.schema.names)}
            n = batch.num_rows
            # project to the model's column order (reader emits the full
            # CURRENT schema with null-fill)
            for i in range(n):
                got.append(tuple(cols[c][i] if c in cols else None for c in model.cols))
    expect: list[tuple] = []
    for s in rng_seqs:
        op, added = model.seq_ops[s]
        if op == "replace":
            continue
        # appended tuples were recorded under the columns at commit time;
        # pad to the current width
        for t in added:
            expect.append(tuple(list(t) + [None] * (len(model.cols) - len(t))))
    assert sorted(got) == sorted(expect), (
        f"stream tail ({offset}, {latest}]: got {sorted(got)[:5]}... "
        f"expected {sorted(expect)[:5]}..."
    )
    return latest


# the full op mix, and a MAINTENANCE-ONLY mix (no DML): DML snapshots wedge
# the tail by contract, so under the full mix the compact→expire→append→tail
# chain is rarely reachable — exactly the schedule that hid the r10
# properties-wipe stream wedge (review r10 #7). The maintenance tier keeps
# the tail alive through every sequence, so retention-gap interplay is
# exercised on every seed. "race" (r11) runs an append against a concurrent
# interloping append — the optimistic retry must land BOTH. The
# evolve-upsert tier (r11, VERDICT r10 ask #4) hammers the schema-evolution
# × equality-delete interplay specifically.
_FULL_MIX = (
    ["append", "delete", "update", "upsert", "compact", "expire", "evolve",
     "tail", "race", "fullover", "rename", "respec"],
    [24, 13, 12, 11, 11, 8, 7, 8, 6, 6, 5, 6],
)
_MAINT_MIX = (
    ["append", "compact", "expire", "evolve", "tail", "respec"],
    [32, 20, 16, 8, 20, 8],
)
_EVOLVE_UPSERT_MIX = (
    ["append", "upsert", "evolve", "delete", "compact", "race", "rename"],
    [20, 30, 22, 10, 12, 6, 12],
)

# initial layouts: unpartitioned, identity, and hidden-partitioning
# transforms (r11) — bucket hashes ids through murmur3, truncate floors
# them; both exercise derived partition tuples end to end
_LAYOUTS = (None, ["bucket"], ["bucket(4, id)"], ["truncate(10, id)"])


def _run_sequence(spark, seed: int, mix=_FULL_MIX) -> None:
    rng = random.Random(seed)
    table = tempfile.mkdtemp(prefix=f"ice_fuzz_{seed}_")
    model = _Model()
    stream_offset = 0
    stream_alive = True
    evolve_count = 0
    try:
        # initial load (seq 1): random layout incl. transform partitioning
        rows = _fresh_rows(model, rng, rng.randrange(2, 6))
        snap = write_iceberg(
            _spark_frame(spark, model, rows),
            table,
            partition_cols=rng.choice(_LAYOUTS),
        )
        for r in rows:
            model.rows[r["id"]] = r
        model.record_snapshot(
            snap, 1, "overwrite", [tuple(r.get(c) for c in model.cols) for r in rows]
        )

        n_ops = rng.randrange(4, 8)
        for _ in range(n_ops):
            op = rng.choices(mix[0], weights=mix[1])[0]
            meta = load_metadata(table)
            if op == "append":
                rows = _fresh_rows(model, rng, rng.randrange(1, 5))
                snap = write_iceberg(
                    _spark_frame(spark, model, rows), table, mode="append"
                )
                for r in rows:
                    model.rows[r["id"]] = r
                model.record_snapshot(
                    snap,
                    meta["last-sequence-number"] + 1,
                    "append",
                    [tuple(r.get(c) for c in model.cols) for r in rows],
                )
            elif op == "delete":
                k, r = rng.choice([2, 3, 5]), rng.randrange(3)
                pred = f"id % {k} = {r}"
                snap = delete_where(spark, table, pred)
                matched = [i for i in model.rows if i % k == r]
                if matched:
                    assert snap is not None
                    for i in matched:
                        del model.rows[i]
                    model.record_snapshot(
                        snap, meta["last-sequence-number"] + 1, "delete", []
                    )
                else:
                    assert snap is None, "delete with no matches must not commit"
            elif op == "update":
                k, r = rng.choice([2, 3, 5]), rng.randrange(3)
                snap = update_where(spark, table, {"v": "v + 1000"}, f"id % {k} = {r}")
                matched = [i for i in model.rows if i % k == r]
                if matched:
                    assert snap is not None
                    for i in matched:
                        model.rows[i]["v"] += 1000
                    # merge-on-read UPDATE re-appends the new images: the
                    # stream would see them (it's a DML snapshot → raises,
                    # but record for completeness)
                    model.record_snapshot(
                        snap,
                        meta["last-sequence-number"] + 1,
                        "overwrite",
                        [
                            tuple(model.rows[i].get(c) for c in model.cols)
                            for i in sorted(matched)
                        ],
                    )
                else:
                    assert snap is None, "update with no matches must not commit"
            elif op == "upsert":
                # half updates of existing ids, half fresh inserts — the
                # equality-delete CDC shape (zero target scan at write)
                existing = sorted(model.rows)
                upd_ids = rng.sample(existing, min(2, len(existing)))
                source_rows = [dict(model.rows[i], v=model.rows[i]["v"] + 7777)
                               for i in upd_ids]
                source_rows += _fresh_rows(model, rng, rng.randrange(1, 3))
                snap = upsert_by_key(
                    spark, table, _spark_frame(spark, model, source_rows), ["id"]
                )
                assert snap is not None
                for r in source_rows:
                    model.rows[r["id"]] = dict(r)
                model.record_snapshot(
                    snap,
                    meta["last-sequence-number"] + 1,
                    "overwrite",
                    [tuple(r.get(c) for c in model.cols) for r in source_rows],
                )
            elif op == "compact":
                stats = compact_iceberg(spark, table, min_files_per_partition=2)
                if stats["snapshot_id"] is not None:
                    model.record_snapshot(
                        stats["snapshot_id"], meta["last-sequence-number"] + 1,
                        "replace", [],
                    )
                    post = plan_scan(table)
                    assert not post["delete_files"] and not post["eq_delete_files"], (
                        "compaction must materialize all delete debt"
                    )
            elif op == "expire":
                keep = rng.randrange(1, 4)
                kept_before = dict(load_metadata(table))
                snaps = kept_before.get("snapshots", [])
                expired = snaps[:-keep] if len(snaps) > keep else []
                current = kept_before.get("current-snapshot-id")
                expired = [s for s in expired if s["snapshot-id"] != current]
                expire_snapshots(table, keep_last=keep)
                for s in expired:
                    model.expired.add(s["sequence-number"])
                    model.live_snap_ids.discard(s["snapshot-id"])
            elif op == "evolve":
                evolve_count += 1
                name = f"x{evolve_count}_{seed}"
                add_column(table, name, T.LongType())
                model.cols.append(name)
                for r in model.rows.values():
                    r.setdefault(name, None)
            elif op == "race":
                # two appends race; the loser's optimistic retry must land
                # BOTH writers' rows (VERDICT r10 ask #3, fuzzed)
                from big_data_analytics_machine_learning_poc_spark.sources import (
                    iceberg_lite as _il,
                )

                main_rows = _fresh_rows(model, rng, rng.randrange(1, 3))
                side_rows = _fresh_rows(model, rng, rng.randrange(1, 3))
                real_cv = _il._current_version
                fired = {"done": False}

                def racing(t, _real=real_cv, _fired=fired, _rows=side_rows):
                    v = _real(t)
                    if not _fired["done"]:
                        _fired["done"] = True
                        write_iceberg(
                            _spark_frame(spark, model, _rows), table, mode="append"
                        )
                    return v

                _il._current_version = racing
                try:
                    snap = write_iceberg(
                        _spark_frame(spark, model, main_rows), table, mode="append"
                    )
                finally:
                    _il._current_version = real_cv
                base = meta["last-sequence-number"]
                snaps_now = load_metadata(table)["snapshots"]
                assert snaps_now[-1]["snapshot-id"] == snap
                assert snaps_now[-1]["sequence-number"] == base + 2
                for r in side_rows:
                    model.rows[r["id"]] = r
                model.record_snapshot(
                    snaps_now[-2]["snapshot-id"], base + 1, "append",
                    [tuple(r.get(c) for c in model.cols) for r in side_rows],
                )
                for r in main_rows:
                    model.rows[r["id"]] = r
                model.record_snapshot(
                    snap, base + 2, "append",
                    [tuple(r.get(c) for c in model.cols) for r in main_rows],
                )
            elif op == "respec":
                # metadata-only partition evolution (r12): the default
                # layout flips; rows are untouched, subsequent ops stage
                # under the new spec and scans mix layouts — exactly the
                # schedules the grouped _scan and per-manifest pruning
                # must hold under
                evolve_partition_spec(table, rng.choice(_LAYOUTS))
            elif op == "rename" and len(model.cols) > 3:
                # rename an EVOLVED column (the base three are referenced
                # by name in the other ops' predicates): physical parquet
                # names stay put, so eq-delete files written before the
                # rename must still apply — the interplay VERDICT r11 #7
                # asked the fuzzer to cover
                old = rng.choice(model.cols[3:])
                newn = old + "r"
                rename_column(table, old, newn)
                model.cols[model.cols.index(old)] = newn
                for r in model.rows.values():
                    if old in r:
                        r[newn] = r.pop(old)
            elif op == "fullover":
                # spec-CHANGING full overwrite (VERDICT r11 #2): replaces
                # every row and may flip the partition layout — the
                # changelog must emit the parent's rows as pre-images
                # under the PARENT's spec (the spec-id-0 falsy bug hid
                # exactly here: no prior seed scheduled an overwrite
                # across a spec change)
                parent_seq = meta["last-sequence-number"]
                rows = _fresh_rows(model, rng, rng.randrange(2, 5))
                snap = write_iceberg(
                    _spark_frame(spark, model, rows),
                    table,
                    partition_cols=rng.choice(_LAYOUTS),
                )
                model.rows = {r["id"]: dict(r) for r in rows}
                model.record_snapshot(
                    snap,
                    parent_seq + 1,
                    "overwrite",
                    [tuple(r.get(c) for c in model.cols) for r in rows],
                )
                model.fullover_parent_seqs.append(parent_seq)
            elif op == "tail" and stream_alive:
                new_offset = _check_tail(table, model, stream_offset)
                if new_offset == stream_offset and load_metadata(table)[
                    "last-sequence-number"
                ] > stream_offset:
                    stream_alive = False  # contractually wedged — stop tailing
                stream_offset = new_offset
            # the cheap independent check after every op
            assert _pyarrow_read(table) == model.tuples(), (
                f"seed {seed}: pyarrow reader diverged after {op}"
            )
        # final checks: the Spark read path agrees with the model...
        got = {
            tuple(row) for row in read_iceberg(spark, table).select(*model.cols).collect()
        }
        assert got == model.tuples(), f"seed {seed}: read_iceberg diverged"
        # ...the changelog replays to the current state (insert minus
        # delete as multisets == the table) across whatever DML/compact/
        # evolution interleaving this seed produced, or raises honestly
        # when a non-replace snapshot in range was expired (r11)
        from big_data_analytics_machine_learning_poc_spark.sources.iceberg_lite import (
            iceberg_table_changes,
        )

        non_replace_expired = any(
            model.seq_ops[s][0] != "replace" for s in model.expired
        )
        # a FULL overwrite whose parent snapshot expired cannot derive its
        # removed rows either — even if every expired snapshot was a
        # replace (the parent's manifest list is gone)
        non_replace_expired = non_replace_expired or any(
            ps in model.expired for ps in model.fullover_parent_seqs
        )
        if non_replace_expired:
            with pytest.raises(RuntimeError):
                iceberg_table_changes(spark, table, 0)
        else:
            ch = iceberg_table_changes(spark, table, 0)
            ins = ch.filter("_change_type = 'insert'").select(*model.cols)
            dl = ch.filter("_change_type = 'delete'").select(*model.cols)
            replay = {tuple(r) for r in ins.exceptAll(dl).collect()}
            assert replay == model.tuples(), (
                f"seed {seed}: changelog replay diverged"
            )
        # ...and time travel to up to two random LIVE snapshots reproduces
        # the rows (and width) the table had then
        live = sorted(model.live_snap_ids)
        for snap_id in rng.sample(live, min(2, len(live))):
            _seq, cols_then, rows_then = model.snaps[snap_id]
            got_then = _pyarrow_read(table, snapshot_id=snap_id)
            assert got_then == set(rows_then), (
                f"seed {seed}: time travel to snapshot {snap_id} diverged"
            )
    finally:
        shutil.rmtree(table, ignore_errors=True)


_ALWAYS_ON = list(range(12))
_FULL = list(range(12, 100))


@pytest.mark.parametrize("seed", _ALWAYS_ON)
def test_lifecycle_fuzz(spark, seed):
    _run_sequence(spark, seed)


@pytest.mark.parametrize("seed", range(1000, 1008))
def test_lifecycle_fuzz_maintenance(spark, seed):
    """DML-free tier: the stream tail survives the whole sequence, so
    every seed exercises compact/expire/append/tail interplay."""
    _run_sequence(spark, seed, mix=_MAINT_MIX)


@pytest.mark.parametrize("seed", range(2000, 2006))
def test_lifecycle_fuzz_evolve_upsert(spark, seed):
    """Directed tier (VERDICT r10 ask #4): schema evolution interleaved
    with equality-delete upserts and racing writers — the interplay class
    the last three rounds' review passes kept finding bugs in."""
    _run_sequence(spark, seed, mix=_EVOLVE_UPSERT_MIX)


@pytest.mark.skipif(
    not os.environ.get("ICEBERG_FUZZ_FULL"),
    reason="full 100-seed tier (run by the round-close battery; "
    "ICEBERG_FUZZ_FULL=1 to enable)",
)
@pytest.mark.parametrize("seed", _FULL)
def test_lifecycle_fuzz_full(spark, seed):
    _run_sequence(spark, seed)
