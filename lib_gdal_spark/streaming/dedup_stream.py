"""Streaming near-duplicate detection: the MinHash-LSH band join of
``operators/dedup.minhash_lsh_pairs`` carried to the unbounded case.

The signature and band-key stages are stateless Arrow projections (they
stream unchanged); the bucket "self-join" becomes a KEYED STATE problem —
each (band, bucket) key remembers the signatures it has seen, and every
newly arriving document is compared against them (and against earlier
docs in its own micro-batch), emitting (doc_a, doc_b, est_jaccard) the
moment the SECOND member of a pair arrives. State is per-bucket and
bounded by ``max_bucket`` (the hot-bucket cap mirrors the batch
operators' frequency caps — overflow docs are dropped from state with a
counter, never a quadratic explode).

Batch/stream parity on identical input is the test contract
(tests/test_dedup_stream.py): the streaming pair set (distinct across
bands) equals minhash_lsh_pairs' output.
"""

from __future__ import annotations

import pickle
from collections.abc import Iterator
from typing import Any, Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from lib_gdal_spark.operators import dedup as DD

_PAIR_OUT = "doc_a long, doc_b long, est_jaccard double"
_BUCKET_STATE = "ids binary, sigs binary, dropped long"


def _make_pairs_fn(threshold: float, max_bucket: int):
    def fn(key: Any, batches: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids_b, sigs_b, dropped = state.get
            ids = pickle.loads(ids_b)
            sigs = pickle.loads(sigs_b)
        else:
            ids, sigs, dropped = [], [], 0
        out_a, out_b, out_e = [], [], []
        for b in batches:
            if not len(b):
                continue
            # deterministic arrival order inside the micro-batch
            b = b.sort_values("doc_id")
            for did, sig in zip(b["doc_id"].to_numpy(),
                                b["sig"].to_numpy()):
                s = np.asarray(sig, dtype=np.int64)
                for pid, psig in zip(ids, sigs):
                    if pid == did:
                        continue
                    est = float((s == psig).mean())
                    if est >= threshold:
                        out_a.append(min(pid, did))
                        out_b.append(max(pid, did))
                        out_e.append(est)
                if len(ids) < max_bucket:
                    ids.append(int(did))
                    sigs.append(s)
                else:
                    dropped += 1
        state.update((pickle.dumps(ids), pickle.dumps(sigs),
                      int(dropped)))
        if out_a:
            yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b,
                                "est_jaccard": out_e})
    return fn


def lsh_pairs_stream(
    docs: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
    shingle: int = 3,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    max_bucket: int = 1024,
) -> DataFrame:
    """Streaming (doc_a, doc_b, est_jaccard) near-dup pairs; the same
    signatures, banding, and threshold as the batch operator, so output
    parity holds (a pair found via several bands emits once per band —
    consumers take DISTINCT, exactly like the batch self-join dedups)."""
    num_hashes = bands * rows_per_band
    sigs = DD.minhash_signatures(docs.select(id_col, text_col),
                                 num_hashes, shingle, id_col, text_col,
                                 seed)
    band_keys = sigs.select(
        F.col(id_col).alias("doc_id"),
        "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bd).alias("band"),
                    F.hash(*[F.col("sig")[bd * rows_per_band + r]
                             for r in range(rows_per_band)]).alias("bkey"),
                )
                for bd in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", "sig", F.col("bk.band").alias("band"),
             F.col("bk.bkey").alias("bkey"))
    return (
        band_keys.groupBy("band", "bkey")
        .applyInPandasWithState(
            _make_pairs_fn(threshold, max_bucket),
            outputStructType=_PAIR_OUT,
            stateStructType=_BUCKET_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
