"""Ship this package to executor Python workers.

The local-mode equivalent of ``spark-submit --py-files dist/engine.zip``:
pandas-UDF closures reference this package by module path, so worker
processes must be able to import it regardless of the driver's cwd. The zip
is rebuilt whenever any source file's mtime changes.
"""

from __future__ import annotations

import os
import zipfile

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PARENT = os.path.dirname(_PKG_DIR)


def ensure_pyfiles(spark) -> str:
    sources = [
        os.path.join(root, f)
        for root, _dirs, files in os.walk(_PKG_DIR)
        for f in files
        if f.endswith(".py")
    ]
    # digest of the full (relpath, mtime_ns, size) SET: max(int(mtime))
    # missed sub-second edits (stale code shipped to executors in an
    # edit-run loop) and file deletions entirely (review finding)
    import hashlib

    h = hashlib.md5()
    for f in sorted(sources):
        st = os.stat(f)
        h.update(
            f"{os.path.relpath(f, _PKG_DIR)}|{st.st_mtime_ns}|{st.st_size};".encode()
        )
    stamp = h.hexdigest()[:16]
    zip_path = os.path.join("/tmp", f"chinese_corpus_cleaning_spark_{stamp}.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for full in sources:
                zf.write(full, os.path.relpath(full, _PARENT))
    spark.sparkContext.addPyFile(zip_path)
    return zip_path
