"""IVF ANN search + stateful streaming conversation assembly."""

import math
import time

import pytest
from pyspark.sql import functions as F


class TestIVF:
    @pytest.fixture(scope="class")
    def vectors(self, spark):
        # three well-separated clusters on the unit circle + noise dims
        rows = []
        for i in range(120):
            base = (i % 3) * 2.0 * math.pi / 3
            angle = base + ((i // 3) % 7 - 3) * 0.02
            rows.append((i, [math.cos(angle), math.sin(angle), 0.01 * (i % 5)]))
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_centroids_deterministic(self, vectors):
        from payor_mdm_spark.operators.similarity_search import ivf_build_centroids

        c1 = ivf_build_centroids(vectors, n_centroids=3, seed=42)
        c2 = ivf_build_centroids(vectors, n_centroids=3, seed=42)
        assert c1 == c2
        assert len(c1) == 3

    def test_ivf_topk_matches_brute_force(self, spark, vectors):
        from payor_mdm_spark.operators.similarity_search import (
            brute_force_topk, ivf_build_centroids, ivf_topk,
        )

        centroids = ivf_build_centroids(vectors, n_centroids=3, seed=42)
        queries = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0]), (1, [math.cos(2.1), math.sin(2.1), 0.0])],
            "query_id long, embedding array<float>",
        )
        bf = brute_force_topk(vectors, queries, k=5).collect()
        ivf = ivf_topk(vectors, queries, centroids, k=5, n_probe=2).collect()
        bf_sets = {}
        for r in bf:
            bf_sets.setdefault(r.query_id, set()).add(r.vec_id)
        ivf_sets = {}
        for r in ivf:
            ivf_sets.setdefault(r.query_id, set()).add(r.vec_id)
        for q in bf_sets:
            # probing 2/3 cells must recover >= 4 of the exact top-5
            assert len(bf_sets[q] & ivf_sets.get(q, set())) >= 4

    def test_ivf_probe_bounds_cohort(self, spark, vectors):
        from payor_mdm_spark.operators.similarity_search import (
            ivf_build_centroids, ivf_topk,
        )

        centroids = ivf_build_centroids(vectors, n_centroids=3, seed=42)
        queries = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0])], "query_id long, embedding array<float>"
        )
        one = ivf_topk(vectors, queries, centroids, k=200, n_probe=1)
        # a single probed cell can never return the whole corpus
        assert one.count() < 120


class TestStatefulAssembly:
    def test_assemble_conversations_stream(self, spark, world, tmp_path):
        from payor_mdm_spark.streaming.ingest import read_turn_stream
        from payor_mdm_spark.streaming.stateful import assemble_conversations_stream

        src = str(tmp_path / "src")
        batch = spark.read.parquet(world["turns_path"]).filter(
            F.col("conv_id").isin("conv-crm-000001", "conv-crm-000002")
        )
        batch.write.mode("overwrite").parquet(src)
        want = {
            r.conv_id: r.cnt
            for r in batch.groupBy("conv_id").agg(F.count("*").alias("cnt")).collect()
        }

        stream = read_turn_stream(spark, src)
        assembled = assemble_conversations_stream(stream, gap_seconds=1,
                                                  watermark="0 seconds")
        q = (
            assembled.writeStream.format("memory")
            .queryName("assembled_convs")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            # event-time timeouts only fire when the WATERMARK passes them;
            # the conversation holding the global max ts can never close
            # until later data arrives — append a heartbeat turn far in the
            # future to advance the watermark (the production pattern)
            import datetime

            max_ts = batch.agg(F.max("ts")).collect()[0][0]
            heartbeat = spark.createDataFrame(
                [("conv-heartbeat", 0, "user", "tick", None,
                  max_ts + datetime.timedelta(hours=1))],
                batch.schema,
            )
            heartbeat.write.mode("append").parquet(src)
            deadline = time.time() + 120
            rows = []
            while time.time() < deadline:
                q.processAllAvailable()
                rows = [
                    r for r in spark.sql("select * from assembled_convs").collect()
                    if r.conv_id != "conv-heartbeat"
                ]
                if len(rows) >= len(want):
                    break
                time.sleep(1)
        finally:
            q.stop()

        got = {r.conv_id: r for r in rows}
        assert set(got) == set(want)
        for conv_id, r in got.items():
            assert r.n_turns == want[conv_id]
            # per-turn text preserved in turn order; opener first
            assert r.texts[0] == r.opener_text
            assert len(r.texts) == r.n_turns
