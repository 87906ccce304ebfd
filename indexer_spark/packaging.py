"""Ship the package to executors — the `spark-submit --py-files` story.

`make_pyfiles_zip()` zips the installed `indexer_spark` package; callers
pass it to `spark-submit --py-files` (north_rule requirement) or rely on
`get_spark(ship_package=True)` which calls `sc.addPyFile()` so UDFs
(tokenizer, postings builder, scorers) can unpickle on any executor —
including executors whose Python didn't inherit the driver's sys.path.
"""

from __future__ import annotations

import os
import tempfile
import zipfile


def make_pyfiles_zip(dest: str | None = None) -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if dest is None:
        dest = os.path.join(tempfile.gettempdir(), "indexer_spark_pyfiles.zip")
    tmp = dest + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "indexer_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    os.replace(tmp, dest)
    return dest


if __name__ == "__main__":
    print(make_pyfiles_zip())
