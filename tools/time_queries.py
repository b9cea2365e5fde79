"""Time a subset of catalog queries with bench.py's methodology
(noop sink, untimed warmup pass, best-of-N alternating order).

Usage: python tools/time_queries.py [-n N] name [name ...]
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
        app_name="time-queries",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> None:
        ALL_QUERIES[name].spark(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    for name in args.names:  # untimed warmup
        run(name)
    times: dict[str, float] = {}
    for rep in range(args.n):
        order = args.names if rep % 2 == 0 else list(reversed(args.names))
        for name in order:
            t0 = time.perf_counter()
            run(name)
            dt = round(time.perf_counter() - t0, 3)
            if name not in times or dt < times[name]:
                times[name] = dt
    print(json.dumps({"queries": times, "total": round(sum(times.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
