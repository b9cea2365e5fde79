"""Dump .explain("formatted") for every catalog query to a directory.

Usage: python tools/capture_plans.py <out_dir> [suffix] [name ...]

Writes <out_dir>/<query>_<suffix>.txt (suffix defaults to "before").
Lake-backed queries trigger their one-time lake builds as a side effect
(same keyed cache dirs the bench rebuilds from scratch anyway).
"""

from __future__ import annotations

import io
import os
import sys
import contextlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pokemon_showdown_airflow_etl_spark.plans import ALL_QUERIES
from pokemon_showdown_airflow_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or sorted(ALL_QUERIES)
    os.makedirs(out_dir, exist_ok=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="capture-plans",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # pins (lazy localCheckpoint) replace their subtree with an opaque
    # Scan ExistingRDD, hiding the operators a plan claim may be about;
    # SPARK_GRAFT_CAPTURE_NOPIN=1 additionally captures each plan with
    # pinning disabled (the full logical tree) as <name>_<suffix>_nopin.txt
    nopin = os.environ.get("SPARK_GRAFT_CAPTURE_NOPIN") == "1"
    from pokemon_showdown_airflow_etl_spark import pinning

    def grab(name: str) -> str:
        try:
            df = ALL_QUERIES[name].spark(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            return buf.getvalue()
        except Exception as exc:  # capture must not die mid-sweep
            return f"EXPLAIN FAILED: {exc!r}\n"

    for name in names:
        txt = grab(name)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        if nopin:
            with pinning.disabled():
                ntxt = grab(name)
            with open(
                os.path.join(out_dir, f"{name}_{suffix}_nopin.txt"), "w"
            ) as f:
                f.write(ntxt)
        print(name, "ok" if "FAILED" not in txt else "FAILED", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
