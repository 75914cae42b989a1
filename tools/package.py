"""Build dist/payor_mdm_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_dir: str = "dist") -> str:
    out = os.path.join(ROOT, out_dir)
    os.makedirs(out, exist_ok=True)
    zip_path = os.path.join(out, "payor_mdm_spark.zip")
    pkg = os.path.join(ROOT, "payor_mdm_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                # ship the C kernel source too: executors compile it at
                # first use; without it they fall back to the bit-identical
                # but ~10x slower pure-Python kernels
                if not fn.endswith((".py", ".c")):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, ROOT))
    return zip_path


if __name__ == "__main__":
    print(build())
