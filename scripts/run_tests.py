#!/usr/bin/env python
"""Run the test suite file-by-file in separate pytest processes.

Why: XLA:CPU's JIT compiler segfaults nondeterministically in LONG
processes on this host (observed 2026-08-20: SIGSEGV inside
`backend_compile_and_load` around test ~165 of a full `-m ""` run, and
inside the persistent-cache serializer ~35 tests into a `-m slow` run —
while single-file reruns of the exact same tests pass). Per-file
processes bound the number of compiles a process accumulates and isolate
any crash to one file's report instead of killing the whole suite.

Usage (CI / full mode):
    python scripts/run_tests.py -m ""        # everything incl. @slow
    python scripts/run_tests.py              # fast gate, chunked
Pass-through: any extra args go to pytest verbatim.
Exit code: 0 iff every file's pytest run passed (rc 0) or collected
nothing after deselection (rc 5).
"""
import glob
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    files = sorted(glob.glob(os.path.join(ROOT, "tests", "test_*.py")))
    extra = sys.argv[1:]
    t0 = time.time()
    failures = []
    for f in files:
        rel = os.path.relpath(f, ROOT)
        t1 = time.time()
        r = subprocess.run([sys.executable, "-m", "pytest", rel, "-q",
                            *extra], cwd=ROOT)
        dt = time.time() - t1
        status = "ok" if r.returncode in (0, 5) else f"rc={r.returncode}"
        print(f"== {rel}: {status} ({dt:.0f}s)", flush=True)
        if r.returncode not in (0, 5):
            failures.append((rel, r.returncode))
    print(f"run_tests: {len(files) - len(failures)}/{len(files)} files ok "
          f"in {time.time() - t0:.0f}s"
          + (f"; FAILED: {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
