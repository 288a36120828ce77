"""Sequence packing: greedy bin-packing of documents into fixed token-budget
training sequences.

LLM pre-training consumes fixed-length token sequences; feeding one short
document per sequence wastes the budget on padding. ``pack_sequences``
assigns each document to a (group, seq_id) training sequence by the classic
greedy streaming rule — walk the group's documents in id order, append while
the running fill stays within budget, else start a new sequence. The rule is
deterministic (no RNG, no data-order dependence beyond the declared sort), so
the same corpus packs identically on every engine — the p3 DuckDB oracle
re-derives the exact assignment with a recursive CTE.

Scale shape: ONE shuffle (hash on the group column), then each group packs
in a single ``applyInPandas`` pass — O(rows) per group, Arrow-batched, no
driver involvement. Groups are independent, so 100 TB packs as wide as the
group count; a pathologically hot group can be pre-sharded by any stable
sub-key (e.g. ``pmod(xxhash64(id), shards)`` appended to the group column) at
the cost of one partial sequence per shard boundary — the waste is bounded by
``shards * budget`` tokens per group.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    budget: int = 128,
    group_col: str = "source",
    id_col: str = "doc_id",
    content_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Greedy sequential packing of ``docs`` into token-budget sequences.

    Returns (group, id, n_tokens, seq_id, seq_offset): ``seq_id`` numbers the
    sequences per group from 0; ``seq_offset`` is the token position where
    the document starts inside its sequence. Token counts come from
    ``tokens_col`` when given, else a whitespace split of ``content_col``
    (the engine's t1 token convention). A document longer than the budget
    occupies a sequence alone (never split — chunk first with
    ``text.doc_chunks`` if splitting is wanted).
    """
    if tokens_col is None:
        n = F.size(F.split(F.col(content_col), " ")).cast("long")
    else:
        n = F.col(tokens_col).cast("long")
    sub = docs.select(
        F.col(group_col).alias("__g"), F.col(id_col).alias("__id"), n.alias("__n")
    )
    # derive the group/id field types from the INPUT schema — hardcoding
    # "string"/"long" would reject an int group column or string id despite
    # the generic group_col/id_col API
    g_type = docs.schema[group_col].dataType.simpleString()
    id_type = docs.schema[id_col].dataType.simpleString()
    schema = (
        f"{group_col} {g_type}, {id_col} {id_type}, n_tokens long, "
        "seq_id long, seq_offset long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id", kind="mergesort").reset_index(drop=True)
        seq = 0
        fill = 0
        seqs, offs = [], []
        for i, tokens in enumerate(pdf["__n"]):
            if i == 0:
                fill = tokens
                offs.append(0)
            elif fill + tokens > budget:
                seq += 1
                fill = tokens
                offs.append(0)
            else:
                offs.append(fill)
                fill += tokens
            seqs.append(seq)
        return pd.DataFrame(
            {
                group_col: pdf["__g"],
                id_col: pdf["__id"],
                "n_tokens": pdf["__n"],
                "seq_id": seqs,
                "seq_offset": offs,
            }
        )

    return sub.groupBy("__g").applyInPandas(pack, schema)


def packing_stats(packed: DataFrame, budget: int, group_col: str = "source") -> DataFrame:
    """Per-group packing efficiency from a ``pack_sequences`` result: sequence
    count, mean fill, and utilization (filled tokens / budgeted capacity).
    One aggregation over the packed assignment — no second corpus pass."""
    per_seq = packed.groupBy(group_col, "seq_id").agg(
        F.sum("n_tokens").alias("__fill"), F.count("*").alias("__docs")
    )
    return (
        per_seq.groupBy(group_col)
        .agg(
            F.count("*").alias("n_seqs"),
            F.sum("__docs").alias("n_docs"),
            F.sum("__fill").alias("tokens"),
            F.round(F.avg("__fill"), 4).alias("mean_fill"),
            F.round(F.sum("__fill") / (F.count("*") * F.lit(budget)), 4).alias(
                "utilization"
            ),
        )
        .orderBy(group_col)
    )
