"""Boolean filter engine (reference F1/F2) compiled to a single Column.

The reference evaluates a per-event predicate chain in Go (reference
src/integration/tsdb/process.go:234-287; struct model.go:57-78): a list of
filter records where empty string = wildcard, ``Negation`` inverts the
record, and ``LinkedFilterID`` + ``and``/``or`` chains records recursively.
``IsAtomic`` marks chain roots; the *first* atomic filter decides (the Go
loop returns on the first atomic match — subsequent atomic filters are
dead unless linked).

Compiling the whole chain into one Column expression keeps evaluation
JVM-side where Catalyst can simplify it and push conjunctive parts into
the parquet scan — per-event Go evaluation becomes zero-cost columnar
filtering. Self-traffic suppression (service == "ecollector",
process.go:237-240) is always prepended.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass
class FilterRecord:
    """Mirror of MeasurementFilter (reference model.go:57-78)."""

    id: int
    topic: str = ""
    domain: str = ""
    msg_type: str = ""
    service: str = ""
    negation: bool = False
    is_atomic: bool = True
    linked_filter_id: int = 0
    linked_filter_boolean_operation: str = ""  # "and" | "or"


#: column names the filter engine consults, overridable per input shape
DEFAULT_COLUMNS = {
    "topic": "topic",
    "domain": "domain",
    "msg_type": "msg_type",
    "service": "service",
}


def _record_expr(rec: FilterRecord, cols: dict[str, str]) -> Column:
    expr = F.lit(True)
    if rec.topic:
        expr = expr & (F.col(cols["topic"]) == rec.topic)
    if rec.domain:
        expr = expr & (F.col(cols["domain"]) == rec.domain)
    if rec.msg_type:
        expr = expr & (F.col(cols["msg_type"]) == rec.msg_type)
    if rec.service:
        expr = expr & (F.col(cols["service"]) == rec.service)
    if rec.negation:
        expr = ~expr
    return expr


def compile_filters(
    records: list[FilterRecord],
    columns: dict[str, str] | None = None,
    suppress_self_traffic: bool = True,
) -> Column:
    """Compile the filter chain into one boolean Column.

    Matches the reference's evaluation order exactly: walk records in
    order; the first record that is atomic decides (with its linked chain
    folded in via and/or, evaluated recursively by id); if no atomic
    record exists the event is dropped (process.go:284-286 returns false).
    """
    cols = columns or DEFAULT_COLUMNS
    by_id = {r.id: r for r in records}

    def chain_expr(rec: FilterRecord, seen: frozenset[int]) -> Column:
        expr = _record_expr(rec, cols)
        if rec.linked_filter_id and rec.linked_filter_id in by_id and rec.linked_filter_id not in seen:
            nxt = by_id[rec.linked_filter_id]
            nxt_expr = chain_expr(nxt, seen | {rec.id})
            if rec.linked_filter_boolean_operation == "or":
                expr = expr | nxt_expr
            elif rec.linked_filter_boolean_operation == "and":
                expr = expr & nxt_expr
        return expr

    decided: Column | None = None
    for rec in records:
        if rec.is_atomic:
            decided = chain_expr(rec, frozenset())
            break  # first atomic filter decides (process.go loop returns)
    if decided is None:
        decided = F.lit(False)
    if suppress_self_traffic:
        decided = (F.col(cols["service"]) != "ecollector") & decided
    return decided
