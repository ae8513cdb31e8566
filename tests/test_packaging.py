"""Packaging: the --py-files zip must be importable standalone."""

import os
import subprocess
import sys


def test_pyfiles_zip_importable(tmp_path):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.package_pyfiles import build_zip

    zip_path = build_zip(str(tmp_path / "pkg.zip"))
    code = (
        "import sys; sys.path.insert(0, %r); "
        "from readability_1_spark import extract_one; "
        "r = extract_one('<html><head><title>T</title></head>"
        "<body><p>hi</p></body></html>'); "
        "print(r['status'])" % zip_path
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd="/tmp"
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() in ("ok", "null_result")
