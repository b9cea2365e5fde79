"""Split a catalog query's wall time into BUILD (the Python call that
constructs — and for eager-loop operators like connected components,
partially executes — the DataFrame) vs EXEC (the noop-sink write of the
returned frame). bench.py times the sum; optimizing needs to know which
side the time is on (guide §1: measure first).

Usage: python tools/profile_build.py [-n N] name [name ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pokemon_showdown_airflow_etl_spark.plans import ALL_QUERIES
from pokemon_showdown_airflow_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="profile-build",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    for name in args.names:  # untimed warmup
        ALL_QUERIES[name].spark(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
    out: dict[str, dict[str, float]] = {}
    for rep in range(args.n):
        order = args.names if rep % 2 == 0 else list(reversed(args.names))
        for name in order:
            t0 = time.perf_counter()
            df = ALL_QUERIES[name].spark(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            cur = out.setdefault(name, {"build": 1e9, "exec": 1e9, "total": 1e9})
            cur["build"] = round(min(cur["build"], t1 - t0), 3)
            cur["exec"] = round(min(cur["exec"], t2 - t1), 3)
            cur["total"] = round(min(cur["total"], t2 - t0), 3)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
