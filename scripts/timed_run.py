"""Wall-clock + peak-RSS wrapper (this image has no /usr/bin/time).

Runs the given command as a child process, then writes a one-line JSON
record {"cmd", "wall_s", "max_rss_mb", "returncode"} to the file named by
TIMED_OUT (default: stderr). RSS is the child's ru_maxrss via
resource.getrusage(RUSAGE_CHILDREN) — same number GNU time -v reports as
"Maximum resident set size".

Usage: TIMED_OUT=out.time python scripts/timed_run.py CMD [ARGS...]
"""

from __future__ import annotations

import json
import os
import resource
import subprocess
import sys
import time


def main() -> int:
    cmd = sys.argv[1:]
    if not cmd:
        print("usage: timed_run.py CMD [ARGS...]", file=sys.stderr)
        return 2
    t0 = time.monotonic()
    rc = subprocess.call(cmd)
    wall = time.monotonic() - t0
    rss_kb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
    rec = {"cmd": " ".join(cmd), "wall_s": round(wall, 2),
           "max_rss_mb": round(rss_kb / 1024.0, 1), "returncode": rc}
    out = os.environ.get("TIMED_OUT")
    line = json.dumps(rec)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")
    print(line, file=sys.stderr)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
