"""Sequence packing: greedy fill of documents into fixed-token-budget
training sequences (the batching step of an LLM data pipeline).

Packing is inherently sequential *within a packing stream* (pack id of
doc i depends on every fill before it), so the operator runs one
ordered greedy scan per group via ``applyInPandas`` — the sanctioned
Python boundary (docs/scale.md). The parallelism knob is the grouping:
pack per (lang,) for globally-sequential packs, or per
(lang, pmod(hash(id), n_shards)) at cluster scale — packing is a
heuristic, so sharding the stream costs at most one under-filled pack
per shard while multiplying parallelism by n_shards.

Greedy rule (must stay in lockstep with any SQL mirror): docs are
visited in `order_col` order; doc i opens a new pack iff
fill + size_i > capacity. An oversized doc (size > capacity) therefore
always sits alone in its own pack, never split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pack_sequences(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    size_col: str,
    capacity: int,
) -> DataFrame:
    """Assign each row a 0-based pack_id per key group.

    Output schema: keys + (order_col, size_col, pack_id int). Rows with
    duplicate order values within a group are tie-broken by size then
    remaining columns' omission — callers should pass a unique
    order_col (doc_id).
    """
    import pandas as pd

    from ..session import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)

    key_fields = ", ".join(
        f"{k} {df.schema[k].dataType.simpleString()}" for k in keys
    )
    out_schema = (
        f"{key_fields}, {order_col} {df.schema[order_col].dataType.simpleString()}, "
        f"{size_col} {df.schema[size_col].dataType.simpleString()}, pack_id int"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        pack_ids = []
        fill, pid = 0, 0
        for n in pdf[size_col]:
            n = int(n)
            if pack_ids and fill + n > capacity:
                pid += 1
                fill = 0
            fill += n
            pack_ids.append(pid)
        pdf["pack_id"] = pd.array(pack_ids, dtype="int32")
        return pdf[[*keys, order_col, size_col, "pack_id"]]

    return (
        df.select(*keys, order_col, size_col)
        .groupBy(*keys)
        .applyInPandas(pack, out_schema)
    )
