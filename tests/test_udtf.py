"""Python UDTF surface (Spark 4): a user-defined table function
emitting one row per chunk — API parity check against the JVM
chunker (which remains the hot path)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql.functions import udtf

from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
    text,
)


@udtf(returnType="chunk_id int, chunk string")
class ChunkUDTF:
    def eval(self, text_val: str):
        words = text_val.split(" ")
        chunk, stride = 64, 32
        starts = range(0, max(len(words) - (chunk - 1), 1), stride)
        for i, s in enumerate(starts):
            yield i, " ".join(words[s : s + chunk])


def test_udtf_matches_jvm_chunker(spark):
    doc = " ".join(f"w{i}" for i in range(150))
    spark.udtf.register("chunk_udtf", ChunkUDTF)
    spark.createDataFrame([Row(text=doc)]).createOrReplaceTempView("docs_udtf")
    via_udtf = sorted(
        (r.chunk_id, r.chunk)
        for r in spark.sql(
            "SELECT c.chunk_id, c.chunk FROM docs_udtf, LATERAL chunk_udtf(text) c"
        ).collect()
    )
    df = spark.createDataFrame([Row(doc_id=1, text=doc)])
    via_jvm = sorted(
        (int(r.chunk_id), r.chunk) for r in text.chunk_documents(df).collect()
    )
    assert via_udtf == via_jvm
