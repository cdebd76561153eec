"""Persistent TPU perf worker: polls /tmp/perfq/ for numbered .py jobs,
execs them in-process (shared jit cache), writes .out/.err files."""
import os, sys, time, traceback, io, contextlib

QDIR = "/tmp/perfq"
os.makedirs(QDIR, exist_ok=True)
print("worker up", flush=True)
ns = {}
while True:
    jobs = sorted(f for f in os.listdir(QDIR)
                  if f.endswith(".py") and not os.path.exists(
                      os.path.join(QDIR, f + ".done")))
    for j in jobs:
        path = os.path.join(QDIR, j)
        buf = io.StringIO()
        t0 = time.time()
        try:
            src = open(path).read()
            with contextlib.redirect_stdout(buf), \
                 contextlib.redirect_stderr(buf):
                exec(compile(src, path, "exec"), ns)
            status = "OK"
        except BaseException:
            buf.write(traceback.format_exc())
            status = "FAIL"
        open(path + ".out", "w").write(
            f"[{status} {time.time()-t0:.1f}s]\n" + buf.getvalue())
        open(path + ".done", "w").write("")
        print(f"{j}: {status}", flush=True)
    time.sleep(1)
