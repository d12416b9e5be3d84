"""spark-submit entry point — the north rule's deployment shape.

Run the flagship assignment + zonal pipeline exactly as a cluster user
would, with the package shipped via --py-files (NOT an installed module):

    python scripts/make_pyfiles_zip.py /tmp/geoglue_spark.zip
    /opt/spark/bin/spark-submit --master local[8] \
        --py-files /tmp/geoglue_spark.zip scripts/submit_job.py \
        --rows 2000000 [--sf-dir /root/testdata/sf0.01]

Prints one JSON line: rows, seconds, rows/sec, and a dedup query count —
proof the Arrow UDF closures unpickle from the zip on executors (the
failure mode a repo-cwd pytest run can mask).
"""

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("geoglue-spark-submit-demo")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    # imports AFTER the session exists: modules must resolve from the
    # --py-files zip on both driver and executors
    from geoglue_spark.operators.assign import assign_admin
    from geoglue_spark.operators.dedup import minhash_near_dupes
    from geoglue_spark.operators.zonal import zonal_stats
    from geoglue_spark.queries import QUERY_GRID, _engine

    import bench_points  # tiny helper shipped next to this script

    cover, wkb, _ = _engine(spark)
    pts = bench_points.flagship_points(spark, args.rows)
    t0 = time.time()
    out = zonal_stats(
        assign_admin(pts, cover, wkb, QUERY_GRID), "value", ["count", "mean"]
    )
    n_admins = out.count()
    secs = time.time() - t0
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    n_pairs = minhash_near_dupes(docs, "text", "doc_id", min_jaccard=0.5).count()
    print(
        json.dumps(
            {
                "deploy": "spark-submit --py-files",
                "rows": args.rows,
                "seconds": round(secs, 2),
                "rows_per_sec": round(args.rows / secs, 1),
                "admins": n_admins,
                "minhash_pairs": n_pairs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
