"""Sequence packing: assign documents to fixed-capacity context
windows ("bins") for packed pre-training batches.

Two registered strategies (see queries.py):

- offset binning (``seq_packing``): lay docs end-to-end in id order,
  bin = floor(running_offset / capacity). One window + one groupBy —
  cheapest possible accounting, but a doc can straddle two windows.
- first-fit-decreasing (``seq_packing_ffd``, this module): classic FFD
  bin packing WITHIN each hash shard — no doc straddles a bin, waste is
  bounded (FFD uses ≤ 11/9·OPT + 1 bins), and each shard packs
  independently so the algorithm parallelizes embarrassingly.

Scale shape: the corpus is hash-sharded (engine-agnostic md5 bucket of
the doc id); each shard is one ``applyInPandas`` group whose state is
just the open-bin load list (O(bins_per_shard) memory, not O(docs)).
At 100 TB you raise ``n_shards`` so a shard's docs fit one task — the
global answer is the union of per-shard packings by construction, so
the plan is one shuffle (groupBy shard) followed by narrow output.
FFD itself is the sequential inner loop — that is inherent (bin
packing is order-dependent); sharding is the standard way it is run
at corpus scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def md5_shard(id_col: Column, n_shards: int) -> Column:
    """Engine-agnostic deterministic shard: first 8 hex digits of
    md5(id) mod n_shards (same value DuckDB computes with
    ``CAST(('0x' || substr(md5(id), 1, 8)) AS BIGINT) % n``)."""
    return (F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
             .cast("long") % n_shards)


def pack_ffd(df: DataFrame, capacity: int, n_shards: int = 8,
             id_col: str = "doc_id",
             token_col: str = "n_tokens") -> DataFrame:
    """First-fit-decreasing packing per md5 shard.

    Returns one row per input doc: (doc_id, shard, bin_id, n_tokens).
    Bin ids are 0-based in bin-creation order within the shard. Docs
    are considered in (tokens DESC, id ASC) order — the deterministic
    FFD order, identical to the recursive-CTE oracle's. An item larger
    than ``capacity`` opens (and keeps) its own bin, the standard FFD
    convention for oversized items.
    """
    src = df.select(F.col(id_col).alias("doc_id"),
                    md5_shard(F.col(id_col), n_shards).alias("shard"),
                    F.col(token_col).cast("long").alias("n_tokens"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tokens", "doc_id"],
                              ascending=[False, True])
        loads: list[int] = []
        bins: list[int] = []
        for tok in pdf["n_tokens"]:
            for i, load in enumerate(loads):
                if load + tok <= capacity:
                    loads[i] = load + tok
                    bins.append(i)
                    break
            else:
                bins.append(len(loads))
                loads.append(tok)
        out = pdf.copy()
        out["bin_id"] = bins
        return out[["doc_id", "shard", "bin_id", "n_tokens"]]

    return src.groupBy("shard").applyInPandas(
        pack, "doc_id long, shard long, bin_id long, n_tokens long")
