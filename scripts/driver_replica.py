"""Replicate the driver's correctness gate locally: vanilla SparkSession (no
repo session defaults — this is what bit round 1's nanos queries), first N
queries in registry order, strict dtype-sensitive compare at sf0.01.

Usage: python scripts/driver_replica.py [N] [sf_dir] [--only name1,name2]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# executor Python workers don't inherit driver sys.path mutations — they
# resolve module-by-reference pickles (the mapInPandas folds) via PYTHONPATH,
# so export it before the JVM starts or a foreign-cwd run fails only on the
# UDF-bearing queries
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (_REPO, os.environ.get("PYTHONPATH", "")) if p
)

from pyspark.sql import SparkSession


def main() -> None:
    import shutil

    from pgcapture_spark.session import route_tempfiles_private

    scratch = route_tempfiles_private("pgcs_replica_")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 50
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only"):
            only = set(a.split("=", 1)[1].split(","))

    # vanilla session: intentionally NOT pgcapture_spark.session.get_spark
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-replica")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pgcapture_spark.queries import REGISTRY
    from tests.oracle import assert_parity

    names = list(REGISTRY)[:n]
    if only:
        names = [x for x in list(REGISTRY) if x in only]
    results: dict[str, dict] = {}
    t_all = time.time()
    for i, name in enumerate(names):
        qd = REGISTRY[name]
        t0 = time.time()
        try:
            if qd.oracle is None:
                rows = qd.fn(spark, sf_dir).count()
                results[name] = {"ok": True, "rows_only": rows}
            else:
                assert_parity(spark, name, qd.fn, qd.oracle, sf_dir)
                results[name] = {"ok": True}
        except Exception as e:  # noqa: BLE001
            results[name] = {"ok": False, "err": f"{type(e).__name__}: {e}"}
            traceback.print_exc()
        dt = time.time() - t0
        status = "OK " if results[name]["ok"] else "FAIL"
        print(f"[{i + 1}/{len(names)}] {status} {name} ({dt:.1f}s)", flush=True)
    n_ok = sum(1 for r in results.values() if r["ok"])
    print(f"\n{n_ok}/{len(names)} ok in {time.time() - t_all:.0f}s")
    with open("/tmp/driver_replica.json", "w") as f:
        json.dump(results, f, indent=1)
    for name, r in results.items():
        if not r["ok"]:
            print(f"FAIL {name}: {r['err'][:300]}")
    spark.stop()
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
