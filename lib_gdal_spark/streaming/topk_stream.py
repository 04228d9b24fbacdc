"""Streaming heavy hitters: per-partition Space-Saving sketches
(Metwally, Agrawal & El Abbadi, ICDT 2005) with keyed state — the
unbounded-corpus companion of the batch ``operators/sketch.cms_counts``.

Design: tokens hash-partition into ``n_parts`` state keys; each key owns
ONE Space-Saving summary of at most ``k`` counters (bounded state by
construction — the whole point versus a streaming groupBy().count(),
whose state grows with the vocabulary). Each trigger the operator emits
the key's FULL summary snapshot (<= k rows, so output stays bounded
too) stamped with a monotone ``trig`` sequence; consumers keep the rows
with trig == max(trig) per part — "latest snapshot wins", no cross-era
merging, which is what the paper's guarantees are stated over:

- for every token IN the snapshot: count >= its true count in that
  partition >= count - err;
- any token whose true partition count exceeds N_part / k is present.

When ``k`` exceeds a partition's distinct-token count the sketch
degenerates to EXACT counting (err 0 everywhere) — the batch-parity
contract tests/test_topk_stream.py pins (stream == batch groupBy
count), plus a small-k stress asserting the state bound, the sandwich
invariant, and the N/k retention guarantee.
"""

from __future__ import annotations

import pickle
from collections.abc import Iterator
from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT = "part int, trig long, token string, count long, err long"
_STATE = "summary binary, trig long"


def _make_fn(k: int):
    def fn(key: Any, batches: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        part = int(key[0])
        if state.exists:
            summary_b, trig = state.get
            # summary: token -> [count, err]
            summary: dict[str, list[int]] = pickle.loads(summary_b)
        else:
            summary, trig = {}, 0
        for b in batches:
            if not len(b):
                continue
            # deterministic arrival order inside the micro-batch
            for tok in b.sort_values("token")["token"]:
                if tok in summary:
                    summary[tok][0] += 1
                elif len(summary) < k:
                    summary[tok] = [1, 0]
                else:
                    # evict the (min count, min token) victim — a fixed
                    # deterministic rule; the newcomer inherits the
                    # victim's count as its error bound
                    victim = min(summary, key=lambda t: (summary[t][0], t))
                    cmin = summary.pop(victim)[0]
                    summary[tok] = [cmin + 1, cmin]
        trig += 1
        state.update((pickle.dumps(summary), trig))
        rows = [(part, trig, t, c, e)
                for t, (c, e) in sorted(summary.items())]
        yield pd.DataFrame(
            rows, columns=["part", "trig", "token", "count", "err"])

    return fn


def heavy_hitters_stream(
    tokens: DataFrame,
    k: int = 64,
    n_parts: int = 8,
    token_col: str = "token",
) -> DataFrame:
    """Streaming (part, trig, token, count, err) Space-Saving snapshots
    over a token stream; filter trig == max(trig) per part for the live
    summary and threshold on count - err for guaranteed frequencies."""
    keyed = tokens.select(
        F.pmod(F.xxhash64(F.col(token_col)), F.lit(n_parts))
        .cast("int").alias("part"),
        F.col(token_col).cast("string").alias("token"),
    )
    return keyed.groupBy("part").applyInPandasWithState(
        _make_fn(k),
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
