"""Build the --py-files zip of the engine package.

Usage: python tools/make_pyfiles_zip.py [/tmp/engine.zip]

Delegates to ``ai_pdf_extraction_spark.session.make_package_zip`` —
the same code path ``build_session`` ships programmatically, so the
two zips can never drift.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ai_pdf_extraction_spark.session import make_package_zip  # noqa: E402

if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/engine.zip"
    print(make_package_zip(out, os.path.join(REPO, "ai_pdf_extraction_spark")))
