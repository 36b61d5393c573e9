"""Build the --py-files archive for spark-submit (north-rule deploy form).

    python tools/build_pyfiles_zip.py [out.zip]

Zips the smqtk_indexing_spark package (source only) so executors can
import the engine: spark-submit --py-files smqtk_indexing_spark.zip ...
"""
import os
import sys
import zipfile

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    root, "smqtk_indexing_spark.zip"
)
pkg = os.path.join(root, "smqtk_indexing_spark")
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for dirpath, _dirs, files in os.walk(pkg):
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, root))
print(out)
