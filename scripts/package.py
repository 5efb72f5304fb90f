#!/usr/bin/env python
"""Build dist/engine.zip for ``spark-submit --py-files`` (pure-Python
engine, no custom jars — BASELINE.json:6)."""

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    os.makedirs(os.path.join(ROOT, "dist"), exist_ok=True)
    out = os.path.join(ROOT, "dist", "engine.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(
            os.path.join(ROOT, "mesos_pregel_spark")
        ):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
        z.write(os.path.join(ROOT, "bench.py"), "bench.py")
    print(out)


if __name__ == "__main__":
    main()
