"""Custom stateful streaming operator: first-seen dedup across micro-batches
via ``applyInPandasWithState`` (task brief: "applyInPandasWithState for
custom stateful operators").

Semantics: the stream of (doc_id, content_hash) keeps only the FIRST
occurrence of each content_hash ever seen across the stream's lifetime —
the streaming twin of ``dedup_exact`` (a re-crawled/duplicated page is
dropped, matching the reference's insert-if-absent frontier semantics
[R: database.py unique url index]).

State per content_hash group: the winning doc_id. Output: rows that were
first-seen in this batch. GroupStateTimeout is NoTimeout — exact dedup
state is unbounded by design here; a production deployment bounds it with
a TTL timeout (state expiry = "we may re-admit a duplicate after N days"),
which is a one-line change (GroupStateTimeout.ProcessingTimeTimeout).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([StructField("first_doc_id", StringType())])
OUTPUT_SCHEMA = StructType([
    StructField("content_hash", StringType()),
    StructField("doc_id", StringType()),
])


def _first_seen(key: Any, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    content_hash = key[0]
    if state.exists:
        # Hash already claimed in an earlier batch: everything is a dup.
        return
    best: str | None = None
    for pdf in pdfs:
        for doc_id in pdf["doc_id"]:
            if best is None or doc_id < best:  # deterministic winner
                best = doc_id
    if best is not None:
        state.update((best,))
        yield pd.DataFrame({"content_hash": [content_hash], "doc_id": [best]})


def first_seen_dedup_stream(stream_df):
    """(doc_id, content_hash) stream → first-seen rows only."""
    return (stream_df
            .groupBy("content_hash")
            .applyInPandasWithState(
                _first_seen,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))
