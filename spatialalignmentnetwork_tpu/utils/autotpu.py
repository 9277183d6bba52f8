"""Single-host accelerator arbitration.

TPU-era equivalent of the reference autoGPU.py:85-118 (which polls
nvidia-smi, flock-serializes claimers, and sets CUDA_VISIBLE_DEVICES).
On TPU hosts, device visibility is controlled by environment variables and
chips are not shareable between processes, so arbitration reduces to:

  * flock-based mutual exclusion so two jobs on one host do not race to
    initialize the same chips (libtpu allows one owner process);
  * optional restriction to a subset of chips via TPU_VISIBLE_CHIPS /
    JAX_PLATFORMS before jax backend init.

Usage: call auto_tpu() before the first jax device access; it blocks until
the host lock is free when exclusive=True.
"""

import fcntl
import os
import time

LOCK_PATH = "/tmp/wait_tpu_666.lock"


class Locker:
    """flock-based inter-process lock (reference autoGPU.py:44-83)."""

    def __init__(self, path=LOCK_PATH):
        self.path = path
        self.fd = None

    def acquire(self, blocking=True, poll=1.0):
        self.fd = open(self.path, "w")
        while True:
            try:
                fcntl.flock(
                    self.fd,
                    fcntl.LOCK_EX | (0 if blocking else fcntl.LOCK_NB),
                )
                return True
            except BlockingIOError:
                if not blocking:
                    return False
                time.sleep(poll)

    def release(self):
        if self.fd is not None:
            fcntl.flock(self.fd, fcntl.LOCK_UN)
            self.fd.close()
            self.fd = None

    def __enter__(self):
        self.acquire()
        return self

    def __exit__(self, *exc):
        self.release()


def auto_tpu(visible_chips=None, exclusive=False):
    """Set chip visibility and (optionally) take the per-host job lock.

    visible_chips: e.g. "0" or "0,1" -> TPU_VISIBLE_CHIPS; must run before
    jax initializes its backend.
    Returns a held Locker when exclusive=True (caller releases), else None.
    """
    if visible_chips is not None:
        os.environ["TPU_VISIBLE_CHIPS"] = str(visible_chips)
        os.environ.setdefault("TPU_CHIPS_PER_PROCESS_BOUNDS", "1,1,1")
    if exclusive:
        lock = Locker()
        lock.acquire()
        return lock
    return None
