"""Persistent TPU perf worker: polls /tmp/perfq/ for numbered .py jobs,
execs them in-process (shared jit cache), writes .out/.err files.

Run FROM THE REPO ROOT; jobs run with sys.path[0] = tools/, so insert
/root/repo in the setup job.  A pid lockfile refuses to start while
another worker is alive — two workers racing the queue execute jobs
against different module states (a round-2 footgun: a zombie worker
"OK 6.3s"-stamped jobs the live one never saw)."""
import os, re, sys, time, traceback, io, contextlib

QDIR = "/tmp/perfq"
LOCK = os.path.join(QDIR, "worker.pid")
os.makedirs(QDIR, exist_ok=True)
if os.path.exists(LOCK):
    pid = int(open(LOCK).read().strip() or 0)
    try:
        os.kill(pid, 0)                  # probe only
        sys.exit(f"worker {pid} already running (kill it BY PID or "
                 f"remove {LOCK})")
    except ProcessLookupError:
        pass                             # stale lock: dead owner
open(LOCK, "w").write(str(os.getpid()))
print("worker up", flush=True)
ns = {}


def _job_key(name):
    # numeric-aware ordering: 2_x.py runs before 10_y.py (lexicographic
    # sorted() ran 10 before 2, executing jobs against module state
    # their predecessors had not yet established)
    m = re.match(r"(\d+)", name)
    return (int(m.group(1)) if m else 1 << 30, name)


while True:
    jobs = sorted((f for f in os.listdir(QDIR)
                   if f.endswith(".py") and not os.path.exists(
                       os.path.join(QDIR, f + ".done"))),
                  key=_job_key)
    for j in jobs:
        path = os.path.join(QDIR, j)
        # write-quiescence: a file mid-write would exec truncated, FAIL,
        # and be .done-stamped forever — and later-numbered jobs must
        # NOT run ahead of it (ordering is the contract), so stop the
        # whole scan until the young job settles
        try:
            if time.time() - os.path.getmtime(path) < 1.0:
                break
        except OSError:
            break
        buf = io.StringIO()
        t0 = time.time()
        try:
            src = open(path).read()
            with contextlib.redirect_stdout(buf), \
                 contextlib.redirect_stderr(buf):
                exec(compile(src, path, "exec"), ns)
            status = "OK"
        except Exception:
            # KeyboardInterrupt/SystemExit propagate: the operator must
            # be able to stop the worker without stamping a FAIL .done
            buf.write(traceback.format_exc())
            status = "FAIL"
        open(path + ".out", "w").write(
            f"[{status} {time.time()-t0:.1f}s]\n" + buf.getvalue())
        open(path + ".done", "w").write("")
        print(f"{j}: {status}", flush=True)
    time.sleep(1)
