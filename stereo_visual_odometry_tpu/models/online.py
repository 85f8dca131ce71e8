"""Online (streaming) frame-feed API — the ROS-wrapper equivalent.

The reference's online mode is a ROS node that ApproximateTime-synchronizes
left/right image topics and pushes each pair into ``System::Step_ros``
(``/root/reference/app/ros/robust-vslam/src/robust_vslam_ros.cpp:36-94``).
The TPU-native equivalent is transport-agnostic: a thread-safe feed that
pairs asynchronously-arriving left/right frames by timestamp (the
ApproximateTime policy) and drives ``System.step_online`` on a worker
thread, so producers (sockets, sensors, ROS bridges) never block on device
compute.
"""
from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field

import numpy as np

from .system import System
from ..utils.logging import get_logger


@dataclass
class _PendingFrames:
    """Timestamp-keyed buffers for each camera (ApproximateTime pairing)."""

    left: dict = field(default_factory=dict)
    right: dict = field(default_factory=dict)


class OnlineVO:
    """Asynchronous stereo feed: ``push_left``/``push_right`` from any
    thread; matched pairs are processed in arrival order on a worker."""

    def __init__(self, system: System, slop: float = 0.05, maxlen: int = 16):
        self.system = system
        self.slop = slop
        self.maxlen = maxlen
        self._pending = _PendingFrames()
        self._lock = threading.Lock()
        self._q: queue.Queue = queue.Queue(maxsize=maxlen)
        self._results: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        self.log = get_logger("online")
        self.dropped = 0

    # -------------------------- producers ----------------------------- #

    def push_left(self, ts: float, img: np.ndarray) -> None:
        self._push("left", ts, img)

    def push_right(self, ts: float, img: np.ndarray) -> None:
        self._push("right", ts, img)

    def push_pair(self, ts: float, img_l: np.ndarray, img_r: np.ndarray) -> None:
        self._enqueue(ts, img_l, img_r)

    def _push(self, side: str, ts: float, img: np.ndarray) -> None:
        with self._lock:
            mine = getattr(self._pending, side)
            other = getattr(self._pending, "right" if side == "left" else "left")
            # ApproximateTime: pair with the closest other-side frame
            # within slop (robust_vslam_ros.cpp:38-42's policy, queue 10).
            best, best_dt = None, self.slop
            for ots in other:
                dt = abs(ots - ts)
                if dt <= best_dt:
                    best, best_dt = ots, dt
            if best is not None:
                oimg = other.pop(best)
                pair = (ts, img, oimg) if side == "left" else (ts, oimg, img)
                self._enqueue(*pair)
            else:
                mine[ts] = img
                while len(mine) > self.maxlen:
                    mine.pop(min(mine))

    def _enqueue(self, ts, img_l, img_r) -> None:
        try:
            self._q.put_nowait((ts, img_l, img_r))
        except queue.Full:
            self.dropped += 1  # drop-oldest-producer policy: skip this frame

    # --------------------------- worker ------------------------------- #

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                ts, il, ir = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            m = self.system.step_online(il, ir)
            m["ts"] = ts
            self._results.put(m)

    def poll(self, timeout: float = 0.0):
        """Fetch the next per-frame result dict, or None."""
        try:
            return self._results.get(timeout=timeout) if timeout else self._results.get_nowait()
        except queue.Empty:
            return None

    def close(self) -> None:
        self._stop.set()
        self._worker.join(timeout=2.0)
