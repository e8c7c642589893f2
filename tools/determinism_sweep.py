"""Full-registry determinism sweep (VERDICT r4 ask #5): prove no
query's VALUES depend on partitioning or scheduling by running every
queries() entry under two different shuffle-partition counts and
diffing the driver-style value hashes (column-name-sorted,
order-insensitive, full-double canon — the same hash the external
gate computes).

    python tools/determinism_sweep.py [sf_dir] [query ...]

Any hash diff is a BUG (floating-sum order is the usual suspect; the
engine's integer-cents / floor-round discipline exists to prevent
exactly this). Exit 0 = deterministic.
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

PARTITIONS = (8, 200)


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.17g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.plans import (
        QUERIES,
    )
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.session import (
        get_spark,
    )

    args = list(sys.argv[1:])
    sf_dir = (
        args.pop(0)
        if args and args[0].startswith("/")
        else "/root/testdata/sf0.01"
    )
    only = set(args)
    names = [n for n in QUERIES if not only or n in only]

    spark = get_spark(
        "determinism-sweep",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    diffs = []
    errs = []
    t_all = time.time()
    for name in names:
        hashes = {}
        for parts in PARTITIONS:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            try:
                df = QUERIES[name](spark, sf_dir)
                rows = [tuple(r) for r in df.collect()]
                hashes[parts] = table_hash(df.columns, rows)
            except Exception as exc:  # noqa: BLE001
                errs.append((name, parts, str(exc)[:160]))
                hashes[parts] = f"ERR"
        if len(set(hashes.values())) != 1:
            diffs.append((name, hashes))
            print(f"DIFF {name}: {hashes}", flush=True)
        else:
            print(f"OK   {name}", flush=True)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    print(
        f"\n{len(diffs)} value diffs, {len(errs)} errors"
        f" / {len(names)} queries across partitions={PARTITIONS}"
        f" in {time.time() - t_all:.0f}s"
    )
    for name, parts, msg in errs:
        print(f"ERR {name}@{parts}: {msg}")
    sys.exit(1 if (diffs or errs) else 0)


if __name__ == "__main__":
    main()
