"""North-rule deployment clause: the package ships to a REAL multi-JVM
standalone cluster via ``spark-submit --py-files search_engine_spark.zip``
— the submitted job runs from a scratch cwd with a scrubbed PYTHONPATH, so
driver AND executors can only import the engine from the shipped zip
(tools/submit_pyfiles_demo.py documents the honesty constraints)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_submit_roundtrip():
    out = subprocess.run(
        [
            sys.executable, "tools/submit_pyfiles_demo.py",
            "--files", "300",
            "--workdir", "/tmp/pyfiles_demo_test",
            "--port", "7187",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=330,
    )
    assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-2000:])
    line = [
        l for l in out.stdout.splitlines()
        if l.startswith('{"metric": "pyfiles_submit_demo"')
    ][-1]
    d = json.loads(line)
    assert d["ok"] is True
    assert d["job"]["files"] == 300
    assert d["verify_hits"] > 0
