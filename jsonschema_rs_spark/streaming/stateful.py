"""Custom stateful streaming operators via ``applyInPandasWithState``.

``stream_dedup`` — exact dedup ACROSS micro-batches: the first document per
fingerprint passes through; later arrivals (any batch) are dropped.  State
per fingerprint group is a single seen-flag + keeper id, so state size is
O(distinct fingerprints) and survives restarts via the streaming checkpoint.

This is the streaming analogue of ``operators/dedup.dedup_exact`` and the
pattern to copy for any custom stateful operator (session windows, running
violation counters, rate limiters).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from jsonschema_rs_spark.functions.text import fingerprint

_OUT = StructType([
    StructField("fp", StringType()),
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
])
_STATE = StructType([
    StructField("keeper", LongType()),
    StructField("n_seen", LongType()),
])


def _dedup_fn(key, batches: Iterable[pd.DataFrame], state: GroupState):
    (fp,) = key
    keeper, n_seen = state.get if state.exists else (None, 0)
    out = []
    for pdf in batches:
        pdf = pdf.sort_values("doc_id")
        for _, row in pdf.iterrows():
            n_seen += 1
            if keeper is None:
                keeper = int(row["doc_id"])
                out.append({"fp": fp, "doc_id": keeper,
                            "text": row["text"]})
    state.update((keeper, n_seen))
    if out:
        yield pd.DataFrame(out)


def stream_dedup(stream: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Emit each fingerprint's FIRST document; suppress all later copies."""
    keyed = stream.select(
        fingerprint(F.col(text_col)).alias("fp"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return keyed.groupBy("fp").applyInPandasWithState(
        _dedup_fn,
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
