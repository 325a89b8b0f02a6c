"""The spark-submit --py-files contract: the package must be zip-importable
(pure python, no data files read relative to __file__), since on a cluster
executors receive the library as a zip on sys.path, not an installed dist."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_package_zip_importable(tmp_path):
    zpath = str(tmp_path / "kafka_connect_dynamodb_spark.zip")
    pkg_root = os.path.join(REPO, "kafka_connect_dynamodb_spark")
    with zipfile.ZipFile(zpath, "w") as zf:
        for dirpath, _dirs, files in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, REPO))
    # import EVERY module from the zip in a clean interpreter (no repo on path)
    probe = (
        "import sys, pkgutil, importlib\n"
        f"sys.path.insert(0, {zpath!r})\n"
        "import kafka_connect_dynamodb_spark as pkg\n"
        "mods = [m.name for m in pkgutil.walk_packages(pkg.__path__,"
        " pkg.__name__ + '.')]\n"
        "for m in mods:\n"
        "    importlib.import_module(m)\n"
        "print('IMPORTED', len(mods))\n"
    )
    out = subprocess.run([sys.executable, "-c", probe], capture_output=True,
                         text=True, cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr[-2000:]
    n = int(out.stdout.split()[-1])
    assert n >= 20        # every submodule imports from the zip
