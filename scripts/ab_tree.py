"""Isolated alternating-PROCESS A/B of declared queries across two source
trees (optimization round 2, VERDICT item 3: settle lines the driver flags
while in-tree pairs read flat). Each pass is a FRESH python/JVM process
pinned to one tree (cold JVM, no shared codegen/page-cache session state
beyond the OS cache both sides share), and passes alternate A,B,A,B,... so
slow host drift hits both trees evenly.

Usage:
  python scripts/ab_tree.py <tree_a> <tree_b> <sf_dir> <n_pairs> <query> ...

Prints per-query seconds for every pass plus min-to-min and median ratios.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

_RUNNER = r"""
import json, os, sys, time
root = sys.argv[1]
sf_dir = sys.argv[2]
names = sys.argv[3:]
sys.path.insert(0, root)
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (root, os.environ.get("PYTHONPATH", "")) if p
)
os.chdir(root)
from pgcapture_spark.session import get_spark, route_tempfiles_private
route_tempfiles_private("pgcs_abtree_")
from pgcapture_spark.queries import REGISTRY
spark = get_spark(app="pgcapture-abtree")
spark.sparkContext.setLogLevel("ERROR")
out = {}
for name in names:
    spark.sparkContext.setJobDescription(f"abtree: {name}")
    t0 = time.monotonic()
    df = REGISTRY[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    out[name] = round(time.monotonic() - t0, 3)
print("ABTREE_RESULT " + json.dumps(out))
"""


def _run(tree: str, sf_dir: str, names: list[str]) -> dict[str, float]:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [sys.executable, "-c", _RUNNER, tree, sf_dir, *names],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABTREE_RESULT "):
            return json.loads(line[len("ABTREE_RESULT "):])
    raise RuntimeError(
        f"no result from {tree}: rc={p.returncode}\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    )


def main() -> None:
    tree_a, tree_b, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    n_pairs = int(sys.argv[4])
    names = sys.argv[5:]
    res: dict[str, dict[str, list[float]]] = {
        q: {"A": [], "B": []} for q in names
    }
    for i in range(n_pairs):
        for label, tree in (("A", tree_a), ("B", tree_b)):
            got = _run(tree, sf_dir, names)
            for q, s in got.items():
                res[q][label].append(s)
            print(f"pair {i + 1} {label} ({tree}): {json.dumps(got)}", flush=True)
    print()
    for q in names:
        a, b = res[q]["A"], res[q]["B"]
        print(
            f"{q}: A min {min(a):.3f} med {statistics.median(a):.3f} | "
            f"B min {min(b):.3f} med {statistics.median(b):.3f} | "
            f"min-to-min A/B {min(a) / min(b):.3f}"
        )
    print("RAW " + json.dumps(res))


if __name__ == "__main__":
    main()
