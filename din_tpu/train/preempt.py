"""Graceful-preemption guard: SIGTERM -> checkpoint -> clean exit.

The reference has no failure story at all — a preempted or killed run
loses everything since the last per-epoch save, and optimizer state was
never restored anyway (train_net.py:99,121-125; SURVEY.md §5 'failure
detection / elastic recovery').  TPU fleets preempt routinely
(maintenance, spot reclaims send SIGTERM with a grace window), so the
engine arms this guard around the epoch loop: the signal only sets a
flag, the training loop checks it at each step boundary (never inside the
compiled step), writes a full-state checkpoint
(``stage{N}_epoch{E}_preempt.ckpt`` — params, batch_stats, Adam moments,
epoch) and returns cleanly.  ``cfg.auto_resume`` then picks the file up
on the next launch and continues at the interrupted epoch.

Multi-host note: SIGTERM delivery is per-process, but the STOP decision
must be global — a host that stops while another has entered the next
step's gradient all-reduce deadlocks it.  The engine therefore
all-gathers the local flag at every step boundary (every host
participates every step) and acts only on the agreed maximum.  For the
save itself: with the msgpack backend every process writes its
(replicated) state to its own local path, so any surviving host can
resume; with the orbax backend the save is collective — fleets that
preempt hosts independently should keep ``checkpoint_backend='msgpack'``
for the emergency save or ensure the whole job receives the signal (the
usual pod-reclaim behaviour).
"""

from __future__ import annotations

import signal
import threading
from typing import Iterable


class PreemptionGuard:
    """Context manager that latches termination signals into a flag.

    Handlers are installed on ``__enter__`` and restored on ``__exit__``.
    Installation requires the main thread (CPython restriction); off the
    main thread the guard degrades to an inert flag so embedding the
    engine in a worker thread keeps working (``armed`` reports which).
    """

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self.signals = tuple(signals)
        self._flag = False
        self._prev = {}
        self.armed = False

    def _handler(self, signum, frame):  # noqa: ARG002 (signal signature)
        self._flag = True

    @property
    def should_stop(self) -> bool:
        return self._flag

    def __enter__(self) -> "PreemptionGuard":
        if threading.current_thread() is threading.main_thread():
            for sig in self.signals:
                self._prev[sig] = signal.signal(sig, self._handler)
            self.armed = True
        return self

    def __exit__(self, *exc) -> None:
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev.clear()
        self.armed = False
