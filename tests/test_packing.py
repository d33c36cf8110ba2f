"""FFD sequence packing — validity invariants beyond oracle parity
(parity itself is covered by test_oracle_parity[seq_packing_ffd])."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from map_reduce_mongodb_spark.operators.packing import pack_ffd

CAP = 100


def _fixture(spark):
    # includes an oversized item (tok > CAP) per the FFD convention
    rows = [(i, tok) for i, tok in enumerate(
        [130, 70, 70, 60, 40, 40, 30, 20, 10, 10, 5, 5])]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_ffd_packing_invariants(spark):
    out = pack_ffd(_fixture(spark), capacity=CAP, n_shards=2).toPandas()
    # every doc packed exactly once
    assert sorted(out.doc_id) == list(range(12))
    # bin loads within capacity, except a bin holding one oversized doc
    for (_, _), grp in out.groupby(["shard", "bin_id"]):
        load = grp.n_tokens.sum()
        assert load <= CAP or (len(grp) == 1 and grp.n_tokens.iloc[0] > CAP)
    # bin count per shard is within the FFD guarantee vs the LP bound
    for shard, grp in out.groupby("shard"):
        n_bins = grp.bin_id.nunique()
        oversized = (grp.n_tokens > CAP).sum()
        lower = max(1, math.ceil(
            grp[grp.n_tokens <= CAP].n_tokens.sum() / CAP)) + oversized
        assert n_bins <= math.ceil(11 / 9 * lower) + 1
        # bin ids are dense 0..n_bins-1 (creation order)
        assert sorted(grp.bin_id.unique()) == list(range(n_bins))


def test_ffd_packing_deterministic(spark):
    df = _fixture(spark)
    a = pack_ffd(df, capacity=CAP, n_shards=2).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = pack_ffd(df.repartition(7), capacity=CAP, n_shards=2).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
