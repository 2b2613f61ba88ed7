"""In-session A/B for RUNTIME-settable SQL confs (optimization round 2).

Alternates passes A,B,A,B,... per query inside ONE session (same JVM, same
page cache, same codegen cache), so the comparison is immune to the
cross-run host variance that dominates this box (identical code spans
±5-10%% across full bench runs). Only valid for confs that take effect via
``spark.conf.set`` (AQE knobs, parquet codec, shuffle-partition count);
session-construction confs need the separate-process protocol.

Usage:
  python scripts/ab_conf.py '<json conf dict for B>' <sf_dir> <passes> <query> ...

Prints per-query A/B medians and min-to-min.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (_REPO, os.environ.get("PYTHONPATH", "")) if p
)


def main() -> None:
    import shutil

    from pgcapture_spark.session import get_spark, route_tempfiles_private

    scratch = route_tempfiles_private("pgcs_ab_")
    conf_b: dict[str, str] = json.loads(sys.argv[1])
    sf_dir = sys.argv[2]
    n_pairs = int(sys.argv[3])
    names = sys.argv[4:]
    spark = get_spark(app="pgcapture-ab")
    from pgcapture_spark.queries import REGISTRY

    # converged-run payers must re-pay their fold per timed pass (same
    # contract as bench.py's _CACHED_RUN_RESETS)
    from pgcapture_spark.querydefs.r8wave import _TTM_DIRS
    from pgcapture_spark.querydefs.r9wave import (
        _BF_MULTI_DIRS,
        _IVM_ASOF_DIRS,
        _RELCOMP_DIRS,
        _RELRET_DIRS,
    )
    from pgcapture_spark.querydefs.r10wave import (
        _BF_REQUEUE_DIRS,
        _COMPACT_DYN_DIRS,
        _COMPACT_MULTI_DIRS,
        _DDL_RETAINED_DIRS,
        _DYN_INTERLEAVE_DIRS,
        _EVOLVE_DIRS,
    )
    from pgcapture_spark.querydefs.streamq import _PROTO_MULTI_DIRS

    def _reset_cache_dirs(cache: dict) -> None:
        for d in cache.values():
            shutil.rmtree(d, ignore_errors=True)
        cache.clear()

    _RESETS = {
        "cdc_time_travel_manifest": _TTM_DIRS,
        "cdc_apply_proto_multi_streamed": _PROTO_MULTI_DIRS,
        "cdc_ivm_view_asof_manifest": _IVM_ASOF_DIRS,
        "backfill_streamed_multi": _BF_MULTI_DIRS,
        "cdc_relation_learn_composite": _RELCOMP_DIRS,
        "cdc_time_travel_retention_dynamic": _RELRET_DIRS,
        "cdc_time_travel_schema_asof": _EVOLVE_DIRS,
        "cdc_schema_asof_evolving": _DDL_RETAINED_DIRS,
        "backfill_requeue_streamed": _BF_REQUEUE_DIRS,
        "backfill_dynamic_interleave": _DYN_INTERLEAVE_DIRS,
        "state_compact_multi_execute": _COMPACT_MULTI_DIRS,
        "state_compact_dynamic_execute": _COMPACT_DYN_DIRS,
    }

    def _maybe_reset(name: str) -> None:
        if name in _RESETS:
            _reset_cache_dirs(_RESETS[name])

    # capture the session's current value of every B-side key so the A side
    # restores it exactly (unset keys restore to their default via unset)
    defaults: dict[str, str | None] = {}
    for k in conf_b:
        try:
            defaults[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 - unset conf
            defaults[k] = None

    def _apply(side: str) -> None:
        for k, v in conf_b.items():
            if side == "B":
                spark.conf.set(k, v)
            elif defaults[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, defaults[k])

    # one warm pass (side A) absorbs codegen/fixture-synthesis cost
    for name in names:
        _apply("A")
        _maybe_reset(name)
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()

    results: dict[str, dict[str, list[float]]] = {
        n: {"A": [], "B": []} for n in names
    }
    for _ in range(n_pairs):
        for side in ("A", "B"):
            for name in names:
                _apply(side)
                _maybe_reset(name)
                t0 = time.perf_counter()
                REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                results[name][side].append(time.perf_counter() - t0)
                spark.catalog.clearCache()

    print(json.dumps({"conf_b": conf_b, "sf_dir": sf_dir, "pairs": n_pairs}))
    for name in names:
        a, b = results[name]["A"], results[name]["B"]
        print(
            f"{name}: A min {min(a):.2f} med {statistics.median(a):.2f} "
            f"| B min {min(b):.2f} med {statistics.median(b):.2f} "
            f"| B/A min {min(b) / min(a):.3f} "
            f"| raw A {[round(x, 2) for x in a]} B {[round(x, 2) for x in b]}"
        )
    spark.stop()
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
