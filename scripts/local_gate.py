"""Refresh the full local strict-gate artifact (CORRECTNESS_LOCAL_r{N}.json):
every registry query vs its DuckDB oracle at sf0.01, vanilla session, with
row counts recorded. Usage: python scripts/local_gate.py [round] [sf_dir]"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# executor Python workers resolve module-by-reference pickles via PYTHONPATH
# (driver sys.path mutations don't reach them) — export before the JVM starts
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (_REPO, os.environ.get("PYTHONPATH", "")) if p
)

from pyspark.sql import SparkSession


def main() -> None:
    import shutil

    from pgcapture_spark.session import route_tempfiles_private

    scratch = route_tempfiles_private("pgcs_gate_")
    rnd = sys.argv[1] if len(sys.argv) > 1 else "03"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("local-gate")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pgcapture_spark.queries import REGISTRY
    from tests.oracle import assert_parity

    results: dict[str, dict] = {}
    t_all = time.time()
    for i, (name, qd) in enumerate(REGISTRY.items()):
        t0 = time.time()
        try:
            if qd.oracle is None:
                rows = qd.fn(spark, sf_dir).count()
                results[name] = {"ok": True, "rows_only": rows}
            else:
                ns, nd = assert_parity(spark, name, qd.fn, qd.oracle, sf_dir)
                results[name] = {"ok": True, "spark_rows": ns, "oracle_rows": nd}
        except Exception as e:  # noqa: BLE001
            results[name] = {"ok": False, "err": f"{type(e).__name__}: {e}"[:500]}
            traceback.print_exc()
        status = "OK " if results[name]["ok"] else "FAIL"
        print(f"[{i + 1}/{len(REGISTRY)}] {status} {name} ({time.time() - t0:.1f}s)", flush=True)
    n_ok = sum(1 for r in results.values() if r["ok"])
    print(f"\n{n_ok}/{len(REGISTRY)} ok in {time.time() - t_all:.0f}s")
    with open(f"CORRECTNESS_LOCAL_r{rnd}.json", "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
