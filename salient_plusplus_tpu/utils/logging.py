"""Run logger — in-memory event list flushed to a per-host file.

Parity with the reference's driver logging (driver/drivers/base.py:285-296):
``log(tuple)`` appends, ``flush()`` writes repr lines to
``{job_dir}/{host}_logs.txt``; ``verbose`` mirrors to stdout.
"""

from __future__ import annotations

import os
from typing import Any, List, Optional


class RunLogger:
    def __init__(self, job_dir: Optional[str] = None, host: str = "host0",
                 verbose: bool = False):
        self.job_dir = job_dir
        self.host = host
        self.verbose = verbose
        self.events: List[Any] = []

    def log(self, *event: Any):
        e = event if len(event) > 1 else event[0]
        self.events.append(e)
        if self.verbose:
            print(e, flush=True)

    def flush(self):
        if self.job_dir is None:
            return
        os.makedirs(self.job_dir, exist_ok=True)
        path = os.path.join(self.job_dir, f"{self.host}_logs.txt")
        with open(path, "a") as f:
            for e in self.events:
                f.write(repr(e) + "\n")
        self.events.clear()
