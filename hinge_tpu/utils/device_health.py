"""Accelerator-link health guard.

The single TPU here is reached through a shared-pool tunnel whose
device<->host transfer rate intermittently collapses by ~100-1000x (a
51MB coverage-grid download measured 1s on a healthy claim and ~5 minutes
on a degraded one, while compute-light/small-transfer stages stayed
usable).  Stages that move grid-sized tensors guard themselves with
`best_compute_device()`: one cheap probe per process — dispatch a tiny
jitted op, poll `Array.is_ready()` under a wall budget (never a blocking
sync on a possibly-wedged claim), then time a small fetch — and when the
link is degraded they run their UNCHANGED jax kernels on the CPU backend
via `jax.default_device`, bit-identical results.

HINGE_DEVICE_HEALTH=1/0 forces healthy/degraded; the verdict is cached
for the process (the probe costs ~0.3s healthy).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

_VERDICT: Optional[bool] = None

#: execution-readiness budget; a healthy claim answers in <<1s
PROBE_BUDGET_S = 5.0
#: minimum acceptable fetch rate for the 256KB probe (bytes/s) — the
#: healthy tunnel does ~50MB/s, the degraded one <0.25MB/s
MIN_FETCH_BPS = 1e6
_PROBE_BYTES = 1 << 18


def device_transfer_ok() -> bool:
    """True when the default backend's transfer path looks healthy (always
    True on CPU).  One probe per process."""
    global _VERDICT
    if _VERDICT is not None:
        return _VERDICT
    forced = os.environ.get("HINGE_DEVICE_HEALTH", "")
    if forced in ("0", "1"):
        _VERDICT = forced == "1"
        return _VERDICT
    # the ENTIRE probe — backend/client initialization (which can itself
    # wedge on a dead claim), upload, and fetch — runs in a daemon thread
    # joined with a wall budget; the main thread never waits on the claim.
    # Compile-free by design: a jit would drag the REMOTE compiler into the
    # probe (its first-ever compile blocks for minutes on a degraded
    # claim); a raw upload+fetch exercises exactly the transport whose
    # collapse we are guarding against.  A timed-out thread is abandoned
    # (daemon) and an exit guard avoids native teardown under it.
    import threading

    result = {}

    def _probe():
        try:
            import jax

            if jax.default_backend() == "cpu":
                result["ok"] = True
                return
            x = jax.device_put(np.zeros(_PROBE_BYTES // 4, np.int32))
            jax.block_until_ready(x)
            t0 = time.monotonic()
            np.asarray(x)
            dt = max(time.monotonic() - t0, 1e-9)
            result["ok"] = (_PROBE_BYTES / dt) >= MIN_FETCH_BPS
        except Exception:
            result["ok"] = False

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(PROBE_BUDGET_S)
    if th.is_alive():
        _arm_exit_guard(th)
    _VERDICT = bool(result.get("ok", False))
    return _VERDICT


_EXIT_CODE = [0]
_GUARD_ARMED = False


def _arm_exit_guard(th):
    """A probe thread stuck inside a native transfer cannot be cancelled;
    letting the interpreter tear down C++ state under it raises
    `FATAL: exception not rethrown` / SIGABRT at exit.  When the verdict
    timed out, exit via os._exit AFTER flushing stdio — the process has
    already produced its outputs; skipping native teardown is the only
    clean way out.  Exit codes survive the guard: sys.exit() is wrapped to
    record its code (covers argparse errors and CLI failure paths) and
    uncaught exceptions record 1 (130 for KeyboardInterrupt) via
    excepthook; a bare `raise SystemExit(n)` that never passes through
    sys.exit is the one uncovered path."""
    global _GUARD_ARMED
    if _GUARD_ARMED:
        return
    _GUARD_ARMED = True
    import atexit
    import sys

    prev_hook = sys.excepthook

    def _hook(tp, val, tb):
        _EXIT_CODE[0] = 130 if tp is KeyboardInterrupt else 1
        prev_hook(tp, val, tb)

    sys.excepthook = _hook
    prev_exit = sys.exit

    def _exit(code=None):
        if isinstance(code, bool):
            _EXIT_CODE[0] = int(code)
        elif isinstance(code, int):
            _EXIT_CODE[0] = code
        elif code is None:
            _EXIT_CODE[0] = 0
        else:  # message-style sys.exit("...") => failure, like CPython
            _EXIT_CODE[0] = 1
        prev_exit(code)

    sys.exit = _exit

    def _guard():
        if th.is_alive():
            try:
                sys.stdout.flush()
                sys.stderr.flush()
            except Exception:
                pass
            os._exit(_EXIT_CODE[0])

    atexit.register(_guard)


def best_compute_device():
    """The device grid-heavy stages should pin as jax.default_device:
    None (use the default) when healthy, else the first CPU device."""
    if device_transfer_ok():
        return None
    import jax

    return jax.local_devices(backend="cpu")[0]


def compute_context():
    """Context manager for a stage body: default device or CPU fallback."""
    import contextlib

    import jax

    dev = best_compute_device()
    if dev is None:
        return contextlib.nullcontext()
    return jax.default_device(dev)
