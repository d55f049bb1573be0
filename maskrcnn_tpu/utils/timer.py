"""Wall-clock timer (reference utils/timer.py:8-40). Device sync happens via
jax.block_until_ready at the call sites instead of cuda.synchronize."""

import datetime
import time


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0

    @property
    def average_time(self):
        return self.total_time / self.calls if self.calls > 0 else 0.0

    def tic(self):
        self.start_time = time.time()

    def toc(self, average=True):
        self.diff = time.time() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        return self.average_time if average else self.diff

    def total_time_str(self):
        return str(datetime.timedelta(seconds=int(self.total_time)))
