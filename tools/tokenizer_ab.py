"""Tokenizer A/B (VERDICT r10 ask #6, extended r12 per VERDICT r11
#5): whitespace vs lang_aware cost at soak scale for BOTH the
near-dup funnel (near_dedup_minhash) and the CDC chunk tier
(chunk_dedup_report). Runs each op under both tokenizers on the
replicated soak corpus (tools/soak.py layout) and prints wall
seconds (min of two passes each), plus the shingle-row and
chunk-row counts that explain the deltas.

    python tools/tokenizer_ab.py [replication ...]   # default: 10 30

Writes nothing; paste the table into PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [10, 30]
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
        dedup,
    )
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.session import (
        get_spark,
    )

    spark = get_spark(
        "tokenizer_ab",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for rep in reps:
        src = f"/tmp/soak_x{rep}/documents.parquet"
        if not os.path.exists(src):
            print(f"missing {src} — run tools/soak.py {rep} first")
            continue
        from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.operators import (
            text,
        )

        docs = spark.read.parquet(src)
        counts = {
            "ws_shingle_rows": dedup.shingles(docs).count(),
            "la_shingle_rows": dedup.lang_aware_shingles(docs).count(),
            "ws_chunk_rows": text.cdc_chunk_table(
                docs, tokenizer="whitespace"
            ).count(),
            "la_chunk_rows": text.cdc_chunk_table(
                docs, tokenizer="lang_aware"
            ).count(),
        }
        walls = {}
        for mode in ("whitespace", "lang_aware"):
            ts = []
            for _ in range(2):
                t0 = time.time()
                dedup.near_dedup_minhash(docs, tokenizer=mode).write.format(
                    "noop"
                ).mode("overwrite").save()
                ts.append(round(time.time() - t0, 2))
            walls[mode] = min(ts)
            cs = []
            for _ in range(2):
                t0 = time.time()
                dedup.chunk_dedup_report(
                    docs, tokenizer=mode
                ).write.format("noop").mode("overwrite").save()
                cs.append(round(time.time() - t0, 2))
            walls[f"chunk_{mode}"] = min(cs)
        out[f"x{rep}"] = {**walls, **counts}
        print(json.dumps({f"x{rep}": out[f"x{rep}"]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
