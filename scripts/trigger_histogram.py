"""Per-trigger duration histogram for the streamed declared queries — the
comparable-across-rounds artifact VERDICT r10 asked for on the bimodal heavy
lines (wall totals on this host swing ±3 s on identical code; per-trigger
durations separate a real per-trigger regression from scheduling noise).

A passive StreamingQueryListener collects every micro-batch's
QueryProgressEvent while the declared query runs normally (the querydefs
drive their own awaitTermination); each progress row records batchId plus
the triggerExecution / addBatch durations.

Usage:
  python scripts/trigger_histogram.py <sf_dir> <passes> <query> [query ...]

Prints one JSON line per (query, pass) with the trigger durations, then a
summary (n triggers, median / max trigger ms, total).
"""

from __future__ import annotations

import json
import os
import statistics
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (_REPO, os.environ.get("PYTHONPATH", "")) if p
)

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402


class _Collect(StreamingQueryListener):
    def __init__(self) -> None:
        self.rows: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.rows.append(
            {
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "durationMs": dict(p.durationMs),
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def main() -> None:
    import shutil
    import time

    from pgcapture_spark.session import get_spark, route_tempfiles_private

    scratch = route_tempfiles_private("pgcs_trighist_")
    sf_dir = sys.argv[1]
    passes = int(sys.argv[2])
    names = sys.argv[3:]
    spark = get_spark(app="pgcapture-trighist")
    spark.sparkContext.setLogLevel("ERROR")
    from pgcapture_spark.queries import REGISTRY

    listener = _Collect()
    spark.streams.addListener(listener)
    summary: dict[str, list[dict]] = {q: [] for q in names}
    for i in range(passes):
        for name in names:
            listener.rows.clear()
            spark.sparkContext.setJobDescription(f"trighist: {name}")
            t0 = time.monotonic()
            df = REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = round(time.monotonic() - t0, 3)
            trig = [
                r["durationMs"].get("triggerExecution", 0) for r in listener.rows
            ]
            rec = {
                "pass": i + 1,
                "wall_s": wall,
                "n_triggers": len(trig),
                "trigger_ms": trig,
                "batches": [
                    {"id": r["batchId"], "rows": r["numInputRows"],
                     "ms": r["durationMs"].get("triggerExecution", 0)}
                    for r in listener.rows
                ],
            }
            summary[name].append(rec)
            print(f"HIST {name} " + json.dumps(rec), flush=True)
    print()
    for name in names:
        trig_all = [t for rec in summary[name] for t in rec["trigger_ms"]]
        if not trig_all:
            print(f"{name}: no streaming progress captured")
            continue
        walls = [rec["wall_s"] for rec in summary[name]]
        print(
            f"{name}: triggers/pass {summary[name][0]['n_triggers']}, "
            f"trigger ms med {statistics.median(trig_all):.0f} "
            f"max {max(trig_all)}, wall min {min(walls):.2f}s "
            f"med {statistics.median(walls):.2f}s"
        )
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
