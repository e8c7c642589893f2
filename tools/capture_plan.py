"""Write .explain('formatted') for named queries to plans/<tag>/.

Usage: python tools/capture_plan.py <tag: e.g. r12/foo_before> <sf_dir> <query> [...]
Writes plans/<subpath>/<query>_<suffix>.txt where <tag> is split as
<dir>/<suffix> (e.g. "r12/before" -> plans/r12/<query>_before.txt).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, sf_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sub, suffix = tag.rsplit("/", 1)
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        sub,
    )
    os.makedirs(outdir, exist_ok=True)

    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.plans import (
        QUERIES,
    )
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.session import (
        get_spark,
    )

    spark = get_spark(
        "plans", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
