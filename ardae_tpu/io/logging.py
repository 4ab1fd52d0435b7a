"""Dual-sink logging: stdout + {exp_dir}/log.txt (+ tensorboardX if wanted).

Matches reference utils/msc.py:117-127 logging() and the drivers'
SummaryWriter usage, with the same scalar tag names so dashboards are
directly comparable.
"""

import datetime
import os


def logging(s: str, path=None, filename: str = "log.txt"):
    print(s)
    if path is not None:
        with open(os.path.join(path, filename), "a+") as f:
            f.write(s + "\n")


def get_time() -> str:
    return datetime.datetime.now().strftime("%y%m%d-%H:%M:%S")


def make_writer(path: str):
    """tensorboardX SummaryWriter, or a no-op stub if unavailable."""
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(path)
    except Exception:

        class _Null:
            def add_scalar(self, *a, **k):
                pass

            def add_histogram(self, *a, **k):
                pass

            def add_image(self, *a, **k):
                pass

            def flush(self):
                pass

            def close(self):
                pass

        return _Null()
