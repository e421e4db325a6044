"""Leveled logger that mirrors stdout to registered log files.

Capability parity with the reference's hand-rolled logger
(rmvd/utils/logging.py:33-125): simple leveled printing plus any number of
attached log files, each optionally line-flushed.
"""

from __future__ import annotations

import sys
import threading
from datetime import datetime

_LEVELS = {"debug": 10, "info": 20, "warning": 30, "error": 40}


class _Logger:
    def __init__(self):
        self.level = _LEVELS["info"]
        self._files = {}
        self._lock = threading.Lock()

    def set_level(self, level: str):
        self.level = _LEVELS[level]

    def add_log_file(self, path, flush_line=True):
        with self._lock:
            if path not in self._files:
                self._files[path] = (open(path, "a"), flush_line)

    def remove_log_file(self, path):
        with self._lock:
            entry = self._files.pop(path, None)
            if entry is not None:
                entry[0].close()

    def log(self, level: str, *args):
        if _LEVELS[level] < self.level:
            return
        msg = " ".join(str(a) for a in args)
        line = f"[{datetime.now().strftime('%Y-%m-%d %H:%M:%S')}] [{level.upper()}] {msg}"
        print(line)
        sys.stdout.flush()
        with self._lock:
            for f, flush_line in self._files.values():
                f.write(line + "\n")
                if flush_line:
                    f.flush()

    def debug(self, *args):
        self.log("debug", *args)

    def info(self, *args):
        self.log("info", *args)

    def warning(self, *args):
        self.log("warning", *args)

    def error(self, *args):
        self.log("error", *args)


logger = _Logger()

set_level = logger.set_level
add_log_file = logger.add_log_file
remove_log_file = logger.remove_log_file
debug = logger.debug
info = logger.info
warning = logger.warning
error = logger.error
