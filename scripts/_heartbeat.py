"""Compile-grace heartbeat for long-silent JAX programs on the TPU chain.

Server-side XLA compiles (and long device calls) are host-idle and
log-silent for up to tens of minutes -- indistinguishable, from outside the
process, from the axon-tunnel wedge the chain's 15-min log-silence watchdog
exists to reap.  This module prints a bounded heartbeat from inside the
process instead: while the main thread has been silent for more than
``every_s`` but less than ``grace_s``, emit an "alive" line so the external
watchdog spares the step.  A genuine wedge (a device call that never
returns) outlives the grace window, the beats stop, and the watchdog kills
the step as designed.

Usage: call ``start()`` once at program start and ``touch()`` whenever the
program makes real logged progress (each ``touch`` opens a fresh grace
window, so every new compile gets its own).
"""

from __future__ import annotations

import builtins
import threading
import time

_last = [time.time()]
_print = builtins.print


def touch() -> None:
    """Record real progress; resets the silent-stretch grace window."""
    _last[0] = time.time()


def start(grace_s: float = 1800.0, every_s: float = 240.0) -> None:
    """Start the daemon heartbeat thread (call once per process).

    Every ordinary ``print`` counts as progress (builtins.print is wrapped),
    so callers only need ``touch()`` for progress that bypasses print.
    ``FLUIDGYM_HB_GRACE`` (seconds) overrides ``grace_s`` — cold-cache
    sessions see >30 min first compiles on the big multi-block programs."""
    import os

    grace_s = float(os.environ.get("FLUIDGYM_HB_GRACE", grace_s))

    def printing(*args, **kwargs):
        touch()
        _print(*args, **kwargs)

    builtins.print = printing

    def run() -> None:
        while True:
            time.sleep(every_s)
            quiet = time.time() - _last[0]
            if every_s <= quiet < grace_s:
                _print(
                    f"[hb {time.strftime('%H:%M:%S')}] alive, "
                    f"{int(quiet)}s since last progress "
                    f"(compile / long device call grace)",
                    flush=True,
                )

    threading.Thread(target=run, daemon=True).start()
