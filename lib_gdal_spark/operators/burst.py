"""Kleinberg-style burst detection in exact integer fixed point.

The 2-state burst automaton (Kleinberg, KDD 2002, "Bursty and
hierarchical structure in streams", batched binomial variant): per key,
a time-binned series of (r_t successes out of d_t trials) is labeled by
the minimum-cost state sequence of a baseline state q0 (rate p0) and a
burst state q1 (rate p1 > p0), where emitting (r, d) in state q costs
-(r ln p_q + (d - r) ln(1 - p_q)) and entering the burst state costs
``gamma``; leaving is free. Bursts are the q1 runs of the Viterbi path.

EXACTNESS: all costs live in int64 fixed-point units — the four
emission coefficients and gamma are integer constants precomputed ONCE
(outside the plan; see :func:`cost_units`) so every DP comparison is
integer-exact, order-independent, and bit-identical in any engine.
This is the same fixed-point discipline as operators/graph.pagerank:
a float formulation would make the argmin data-race on the last ulp of
libm ``ln`` and could flip discrete state decisions between engines.

Scale shape: ONE combinable groupBy per key collects the (small,
bounded) bin series, and the forward DP + backtrack run entirely in
JVM higher-order functions (aggregate folds over the sorted array) —
no UDF, no per-row Python, no shuffle beyond the single keyed
aggregation. Skew is bounded by the number of bins per key (a
constant), never the corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cost_units", "kleinberg_bursts"]

_INF = 1 << 60


def cost_units(p0: float, p1: float, scale: int = 10**9) -> dict:
    """Integer emission coefficients for the two states.

    Emission cost of state q at a bin = ``cq_r * r + cq_n * (d - r)``
    units. Computed once in Python (deterministic) and embedded as
    literals on BOTH sides of the correctness gate, so the DP itself
    never touches libm.
    """
    if not (0.0 < p0 < p1 < 1.0):
        raise ValueError("need 0 < p0 < p1 < 1")
    return {
        "c0_r": round(-math.log(p0) * scale),
        "c0_n": round(-math.log(1.0 - p0) * scale),
        "c1_r": round(-math.log(p1) * scale),
        "c1_n": round(-math.log(1.0 - p1) * scale),
    }


def kleinberg_bursts(bins: DataFrame, costs: dict,
                     gamma_units: int) -> DataFrame:
    """Label each (key, tbin) with its Viterbi state (0 base / 1 burst).

    ``bins``: one row per (key, tbin, r, d) — r successes of d trials in
    that bin (both int64; pre-aggregated). ``costs``: the coefficients
    from :func:`cost_units`. ``gamma_units``: integer cost of a
    q0 -> q1 transition (leaving a burst is free, per the paper).

    The chain starts in q0. Ties: at a bin, q0's predecessor tie breaks
    to q0 (<=); q1's predecessor tie breaks to q1 (strict <); the final
    state tie breaks to q0. All three rules are integer comparisons and
    are mirrored verbatim by the SQL oracle.

    Returns (key, tbin, r, d, state).

    Overflow budget: dp accumulates at most
    ``max(costs) * sum(d over a key's bins) + gamma_units`` on top of
    the 2^60 init sentinel — with the default scale=1e9 that bounds a
    key's total trials to ~4e8 before int64 headroom runs out. Rescale
    ``cost_units(..., scale=...)`` down for larger series (the same
    fixed-point budget discipline as graph.pagerank's rank units).
    """
    c0r = F.lit(int(costs["c0_r"])).cast("long")
    c0n = F.lit(int(costs["c0_n"])).cast("long")
    c1r = F.lit(int(costs["c1_r"])).cast("long")
    c1n = F.lit(int(costs["c1_n"])).cast("long")
    gam = F.lit(int(gamma_units)).cast("long")

    seq = (
        bins.groupBy("key")
        .agg(F.array_sort(F.collect_list(F.struct(
            F.col("tbin").cast("long").alias("tbin"),
            F.col("r").cast("long").alias("r"),
            F.col("d").cast("long").alias("d")))).alias("seq"))
    )

    def fwd(acc, x):
        e0 = c0r * x["r"] + c0n * (x["d"] - x["r"])
        e1 = c1r * x["r"] + c1n * (x["d"] - x["r"])
        enter = acc["dp0"] + gam
        a0 = F.when(acc["dp0"] <= acc["dp1"], F.lit(0)).otherwise(F.lit(1))
        a1 = F.when(enter < acc["dp1"], F.lit(0)).otherwise(F.lit(1))
        cand0 = F.least(acc["dp0"], acc["dp1"])
        cand1 = F.least(enter, acc["dp1"])
        return F.struct(
            (cand0 + e0).alias("dp0"),
            (cand1 + e1).alias("dp1"),
            F.concat(acc["hist"], F.array(F.struct(
                a0.alias("a0"), a1.alias("a1")))).alias("hist"),
        )

    zero = F.struct(
        F.lit(0).cast("long").alias("dp0"),
        F.lit(_INF).cast("long").alias("dp1"),
        F.array().cast("array<struct<a0:int,a1:int>>").alias("hist"),
    )
    done = seq.withColumn("fin", F.aggregate("seq", zero, fwd))
    final_state = F.when(
        F.col("fin.dp0") <= F.col("fin.dp1"), F.lit(0)).otherwise(F.lit(1))

    # backtrack: fold the reversed decision list; each step records the
    # current state then moves to its predecessor. The trailing cursor
    # (the pre-series init state) is discarded with the fold.
    def back(acc, h):
        prev = F.when(acc["cur"] == 0, h["a0"]).otherwise(h["a1"])
        return F.struct(
            prev.alias("cur"),
            F.concat(acc["arr"], F.array(acc["cur"])).alias("arr"),
        )

    bzero = F.struct(
        final_state.alias("cur"),
        F.array().cast("array<int>").alias("arr"),
    )
    done = done.withColumn(
        "states",
        F.reverse(
            F.aggregate(F.reverse(F.col("fin.hist")), bzero, back)["arr"]),
    ).withColumn("z", F.arrays_zip("seq", "states"))
    return done.select(
        "key", F.explode("z").alias("e")
    ).select(
        "key",
        F.col("e.seq.tbin").alias("tbin"),
        F.col("e.seq.r").alias("r"),
        F.col("e.seq.d").alias("d"),
        F.col("e.states").cast("int").alias("state"),
    )
