"""Shared MERGE WHEN-clause surface for the two lakehouse engines.

``delta_lite.merge_delta`` (copy-on-write) and ``iceberg_lite.merge_iceberg``
(merge-on-read) accept the identical clause language::

    when_matched = [(condition | None, "delete" | {"update": {col: expr}}), ...]
    when_not_matched_insert = True | False | "<SQL over bare source columns>"

with conditions/expressions over ``t.<col>`` (target) and ``s.<col>``
(source), FIRST matching clause winning per row (ANSI MERGE clause-order
semantics). Everything about that language that is not engine plumbing —
validation, the first-match-wins clause-index column, the per-clause full
update images, the accepted-insert filter, and the union of new-row frames —
lives HERE, once (VERDICT r11 #5: the previous copy in each engine was ~50
duplicated lines whose dual-oracle parity would silently diverge on the
first one-sided edit). Only key comparison (null-safe vs plain equality)
and the delete/rewrite plumbing stay engine-specific.

``when_not_matched_insert`` string conditions are over BARE source column
names (both engines apply the filter to the anti-joined source AFTER it is
projected to plain columns — ADVICE r11: iceberg's docstring used to claim
``s.``-qualified names which may fail to resolve post-projection).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def default_upsert_all(data_cols: list[str]) -> list:
    """The clause list meaning ``WHEN MATCHED UPDATE SET *``."""
    return [(None, {"update": {c: f"s.{c}" for c in data_cols}})]


def validate_when_matched(when_matched: list, data_cols: list[str]) -> None:
    """Reject malformed actions and update targets outside the schema.

    Raises ValueError / KeyError with the exact messages both engines have
    always produced (tests pin them).
    """
    for _cond, action in when_matched:
        if action == "delete":
            continue
        if not (isinstance(action, dict) and set(action) == {"update"}):
            raise ValueError(
                f"when_matched action must be 'delete' or "
                f"{{'update': {{col: expr}}}}, got {action!r}"
            )
        unknown = sorted(set(action["update"]) - set(data_cols))
        if unknown:
            raise KeyError(f"MERGE update targets not in table schema: {unknown}")


def clause_index_column(when_matched: list) -> Column:
    """First-match-wins clause decision over a ``t``/``s``-aliased join:
    the int index of the first clause whose condition holds, NULL when no
    clause matches (row stays untouched) — including the insert-only MERGE
    (``when_matched == []``), where every matched row is untouched."""
    if not when_matched:
        return F.lit(None).cast("int")
    clause = None
    for i, (cond, _action) in enumerate(when_matched):
        c = F.expr(cond) if cond is not None else F.lit(True)
        clause = F.when(c, F.lit(i)) if clause is None else clause.when(c, F.lit(i))
    return clause.otherwise(F.lit(None)).cast("int")


def image_projections(
    when_matched: list, data_cols: list[str], by_name: dict
) -> list[Column]:
    """Every update clause's FULL new image, side by side, over the
    ``t``/``s``-aliased join — columns ``_img{i}_{col}`` for clause i
    (delete clauses produce none). Assigned expressions cast to the table
    column's type; unassigned columns carry the target value through."""
    sel: list[Column] = []
    for i, (_cond, action) in enumerate(when_matched):
        if action == "delete":
            continue
        assigns = action["update"]
        sel += [
            F.expr(assigns[c]).cast(by_name[c]).alias(f"_img{i}_{c}")
            if c in assigns
            else F.col(f"t.{c}").alias(f"_img{i}_{c}")
            for c in data_cols
        ]
    return sel


def apply_insert_filter(inserts: DataFrame, when_not_matched_insert) -> DataFrame:
    """True = all unmatched source rows; False = none; a string = a SQL
    condition over the bare source columns."""
    if when_not_matched_insert is True:
        return inserts
    if when_not_matched_insert:
        return inserts.filter(F.expr(when_not_matched_insert))
    return inserts.limit(0)


def update_image_frames(
    pairs: DataFrame, when_matched: list, data_cols: list[str], clause_col: str
) -> list[DataFrame]:
    """One frame per update clause: its hit rows' new images under the
    plain column names, ready to union into the engine's new data files."""
    out: list[DataFrame] = []
    for i, (_cond, action) in enumerate(when_matched):
        if action == "delete":
            continue
        out.append(
            pairs.filter(F.col(clause_col) == i).select(
                *[F.col(f"_img{i}_{c}").alias(c) for c in data_cols]
            )
        )
    return out


def union_all(frames: list[DataFrame]) -> DataFrame:
    """unionByName fold — every MERGE new-row side is heterogeneous frames
    with identical schemas."""
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out
