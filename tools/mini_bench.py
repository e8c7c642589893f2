"""Interleaved A/B helper: time a fixed subset of registry queries
(bench.py methodology — noop sink, 2 passes, min) in THIS tree.

Usage: python tools/mini_bench.py <sf_dir> <query> [query ...]
Prints one JSON line {query: min_seconds}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.plans import (
        QUERIES,
    )
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.session import (
        get_spark,
    )

    spark = get_spark(
        "mini_bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    for wname in ("total_users", "pricing_summary", "text_stats"):
        QUERIES[wname](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _pass in range(2):
        for name in names:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[name].append(round(time.time() - t0, 3))
    print(json.dumps({n: min(ts) for n, ts in runs.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
