#!/usr/bin/env python3
"""Round-6 optimization harness (bench.py is FROZEN — extra tooling here).

Modes:
  python bench_extra.py time Q1 Q2 ...      # per-query noop-sink timing, best-of-N
  python bench_extra.py plans TAG Q1 Q2 ... # dump .explain("formatted") to plans/r06/<q>_<TAG>.txt

Same session config as bench.py (local[$SPARK_GRAFT_CPUS], shuffle.partitions
= cores, AQE on) so numbers are comparable; each query is isolated with the
noop sink per the optimization guide §1.4 and labelled per §1.5.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import make_spark, materialize  # noqa: E402


def main() -> None:
    mode = sys.argv[1]
    if mode == "plans":
        tag, names = sys.argv[2], sys.argv[3:]
    else:
        tag, names = "", sys.argv[2:]
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "3"))

    import __spark_entry__ as entry_mod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = make_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    if mode == "plans":
        outdir = os.path.join(os.path.dirname(__file__), "plans", "r06")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
            spark.catalog.clearCache()
            print(f"wrote {name}_{tag}.txt")
    elif mode == "time":
        timings = {}
        for name in names:
            walls = []
            for _ in range(reps):
                spark.sparkContext.setJobDescription(f"r06: {name}")
                t0 = time.perf_counter()
                materialize(qs[name](spark, sf_dir))
                walls.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
            timings[name] = {"min": min(walls), "all": walls}
            print(json.dumps({name: timings[name]}))
        print(json.dumps(timings))
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
