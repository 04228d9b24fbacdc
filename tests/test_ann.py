

class TestInt8Quantization:
    def test_bounds_and_reconstruction(self, spark):
        import numpy as np
        from lib_gdal_spark.operators.ann import quantize_embeddings
        rng = np.random.default_rng(7)
        rows = [(i, rng.standard_normal(16).tolist()) for i in range(40)]
        rows.append((40, [0.0] * 16))  # all-zero vector
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {r.vec_id: r for r in quantize_embeddings(emb).collect()}
        for i, v in rows:
            q, s = out[i].qvec, out[i].scale
            assert all(-127 <= e <= 127 for e in q)
            if s == 0.0:
                assert all(e == 0 for e in q)
                continue
            # max-abs element quantizes to exactly +-127
            assert max(abs(e) for e in q) == 127
            # reconstruction error bounded by half a quantization step
            step = s / 127.0
            for x, e in zip(v, q):
                assert abs(x - e * step) <= step / 2 + 1e-12

    def test_int8_topk_recall(self, spark):
        import numpy as np
        from lib_gdal_spark.operators.ann import (
            cosine_topk,
            cosine_topk_int8,
            quantize_embeddings,
        )
        rng = np.random.default_rng(11)
        rows = [(i, rng.standard_normal(32).tolist()) for i in range(60)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        queries = emb.where("vec_id < 4").selectExpr(
            "vec_id AS qid", "embedding AS qvec_f")
        exact = cosine_topk(queries, emb, k=5,
                            query_cols=("qid", "qvec_f"))
        qc = quantize_embeddings(emb)
        approx = cosine_topk_int8(queries, qc, k=5)
        ex = {(r.qid, r.vec_id) for r in exact.collect()}
        ap = {(r.qid, r.vec_id) for r in approx.collect()}
        # int8 keeps ~7 bits of precision; top-5 should survive nearly intact
        assert len(ex & ap) >= int(0.8 * len(ex))


def test_embedding_qa_flags(spark):
    """QA gate: dims / NaN / zero / norm-bound verdicts (round-4)."""
    from pyspark.sql import functions as F

    from lib_gdal_spark.operators.ann import embedding_qa

    rows = [
        (1, [3.0, 4.0]),          # norm 5, ok
        (2, [0.0, 0.0]),          # zero
        (3, [float("nan"), 1.0]),  # NaN
        (4, [1.0, 2.0, 3.0]),     # wrong dims
        (5, [1e9, 1e9]),          # exploded norm
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in
           embedding_qa(df, expected_dims=2).collect()}
    assert out[1]["ok"] == 1 and abs(out[1]["l2_norm"] - 5.0) < 1e-9
    assert out[2]["is_zero"] == 1 and out[2]["ok"] == 0
    assert out[3]["has_nan"] == 1 and out[3]["ok"] == 0
    assert out[4]["n_dims"] == 3 and out[4]["ok"] == 0
    assert out[5]["ok"] == 0
