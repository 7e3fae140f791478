"""Package the engine for ``spark-submit --py-files`` deployment.

Produces ``dist/cdc_engine.zip`` containing the
``kafka_connect_converter_json_spark`` package; a cluster run is then

    spark-submit --py-files dist/cdc_engine.zip your_job.py

where ``your_job.py`` imports the engine exactly like the tests do.
Verified locally: the zip imports cleanly on sys.path (zipimport).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "kafka_connect_converter_json_spark"


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "cdc_engine.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    out = main()
    # self-check: the zip is importable via zipimport (what --py-files does)
    sys.path.insert(0, out)
    for mod in list(sys.modules):
        if mod.startswith(PKG):
            del sys.modules[mod]
    import importlib

    m = importlib.import_module(f"{PKG}.functions.logical_types")
    assert m.date_to_string(0) == "1970-01-01"
    print("zipimport self-check: OK")
