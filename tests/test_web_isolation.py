"""Run the web-server tests in a fresh subprocess.

The full suite skips ``tests/test_web.py`` in-process (see the
``pytest_collection_modifyitems`` hook in ``conftest.py``: XLA:CPU
intermittently segfaults when compiling on a background thread late in
a long-lived process, and the web render thread is the suite's only
off-main-thread compile site).  This wrapper re-runs the whole file in
a young interpreter, where those compiles are reliably safe.
"""

import os
import subprocess
import sys


def test_web_suite_in_subprocess():
    test_file = os.path.join(os.path.dirname(__file__), "test_web.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "pytest", test_file, "-q", "--no-header"],
        cwd=repo_root, capture_output=True, text=True, timeout=1500)
    if r.returncode != 0:
        sys.stdout.write(r.stdout[-8000:])
        sys.stderr.write(r.stderr[-4000:])
    assert r.returncode == 0, f"web tests failed in subprocess (rc={r.returncode})"
