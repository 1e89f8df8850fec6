"""Build the --py-files zip of the engine package.

Usage: python tools/make_pyfiles_zip.py [/tmp/engine.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(out_path: str) -> str:
    pkg_dir = os.path.join(REPO, "ai_pdf_extraction_spark")
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for name in files:
                if name.endswith(".py"):
                    full = os.path.join(root, name)
                    rel = os.path.relpath(full, REPO)
                    zf.write(full, rel)
    os.replace(tmp, out_path)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/engine.zip"
    print(make_zip(out))
