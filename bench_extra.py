"""Per-query measurement harness for the optimization round (bench.py is
FROZEN for driver measurement; this file exists for §1-style isolation).

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_CPUS=32 \
    python bench_extra.py [--noop] [--explain DIR] [--reps N] q1 q2 ...

For each named query: runs `reps` fresh-plan executions, each bracketed by
the same fixed-cost steal probe bench.py uses, and prints per-rep seconds +
min + the probe verdict. `--noop` times a noop-sink write (computes every
column) instead of bench.py's `.count()`; default matches the frozen
methodology (.count()). `--explain DIR` writes `<dir>/<query>.txt` with
`explain(formatted)` before timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import PROBE_REF_SEC, _flagship_job, BENCH_ROWS


def main() -> None:
    from geoglue_spark import queries as Q
    from geoglue_spark.session import get_spark

    args = [a for a in sys.argv[1:]]
    noop = "--noop" in args
    explain_dir = None
    if "--explain" in args:
        explain_dir = args[args.index("--explain") + 1]
        os.makedirs(explain_dir, exist_ok=True)
    reps = 3
    if "--reps" in args:
        reps = int(args[args.index("--reps") + 1])
    names = [
        a
        for i, a in enumerate(args)
        if not a.startswith("--")
        and (i == 0 or args[i - 1] not in ("--explain", "--reps"))
    ]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", min(16, os.cpu_count() or 8)))
    spark = get_spark("bench-extra", cores=cores, shuffle_partitions=cores)
    qs = Q.queries()

    # warm exactly like bench.py: cover cache + python workers + JIT
    from geoglue_spark.queries import _engine

    _engine(spark)
    from bench import run_flagship

    run_flagship(spark, BENCH_ROWS // 10, reps=2)

    def materialize(df) -> None:
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    threshold = 1.25 * PROBE_REF_SEC
    out: dict[str, dict] = {}
    for name in names:
        # one warm (untimed) execution so codegen/JIT for this plan is hot
        materialize(qs[name](spark, sf_dir))
        if explain_dir:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                qs[name](spark, sf_dir).explain("formatted")
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        samples, probes = [], []
        for _ in range(reps):
            p0 = _flagship_job(spark, BENCH_ROWS // 10)
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            materialize(qs[name](spark, sf_dir))
            dt = time.time() - t0
            spark.sparkContext.setJobDescription(None)
            p1 = _flagship_job(spark, BENCH_ROWS // 10)
            samples.append(round(dt, 3))
            probes.append((round(p0, 2), round(p1, 2)))
        clean = [
            s for s, (a, b) in zip(samples, probes) if max(a, b) <= threshold
        ]
        out[name] = {
            "samples": samples,
            "probes": probes,
            "min": min(samples),
            "clean_min": min(clean) if clean else None,
            "sink": "noop" if noop else "count",
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "cores": cores, "results": out}))


if __name__ == "__main__":
    main()
