"""Build the --py-files zip of the geoglue_spark package (the artifact a
real cluster submit ships to executors)."""

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(out: str = "/tmp/geoglue_spark.zip") -> str:
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(ROOT, "geoglue_spark")
        for dirpath, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
        z.write(os.path.join(ROOT, "scripts", "bench_points.py"), "bench_points.py")
    print(out)
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/geoglue_spark.zip")
