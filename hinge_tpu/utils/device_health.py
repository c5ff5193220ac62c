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

HINGE_DEVICE_HEALTH=1/0 forces healthy/degraded (re-read on every check,
so a long pipeline reacts if it flips mid-run); an un-forced healthy
verdict expires after PROBE_TTL_S so stage boundaries re-probe (~0.3s
healthy), and any failed probe or measured-slow fetch (`report_fetch`)
DEMOTES the rest of the process to CPU — the recorded 368s pathology was
a link that collapsed mid-run, which a probe-once guard cannot catch.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

#: execution-readiness budget; a healthy claim answers in <<1s
PROBE_BUDGET_S = 5.0
#: a healthy verdict is trusted this long before the next check re-probes
PROBE_TTL_S = 20.0
#: minimum acceptable fetch rate for the 256KB probe (bytes/s) — the
#: healthy tunnel does ~50MB/s, the degraded one <0.25MB/s
MIN_FETCH_BPS = 1e6
_PROBE_BYTES = 1 << 18

#: verdict cache: `ok` + monotonic stamp; `demoted` is sticky — once the
#: link is seen degraded mid-run, every later stage stays on CPU
_STATE = {"ok": None, "t": 0.0, "demoted": False}


def _reset_state():
    _STATE.update(ok=None, t=0.0, demoted=False)


def report_fetch(nbytes: int, seconds: float) -> None:
    """Stages that time a device->host fetch report it here; a grid-sized
    fetch below MIN_FETCH_BPS is direct evidence of a collapsed link and
    demotes the remaining stages to CPU (no separate probe needed)."""
    if nbytes < _PROBE_BYTES or seconds <= 0:
        return
    if nbytes / seconds < MIN_FETCH_BPS:
        _STATE.update(ok=False, t=time.monotonic(), demoted=True)


def timed_fetch(x) -> np.ndarray:
    """np.asarray(x) with the transfer timed and reported (the fetch is the
    only true barrier on this platform — see CLAUDE.md)."""
    t0 = time.monotonic()
    out = np.asarray(x)
    report_fetch(out.nbytes, time.monotonic() - t0)
    return out


def device_transfer_ok() -> bool:
    """True when the default backend's transfer path looks healthy (always
    True on CPU).  Healthy verdicts expire after PROBE_TTL_S; degraded
    verdicts are sticky for the process."""
    forced = os.environ.get("HINGE_DEVICE_HEALTH", "")
    if forced in ("0", "1"):
        return forced == "1"
    if _STATE["demoted"]:
        return False
    if _STATE["ok"] is not None and \
            time.monotonic() - _STATE["t"] < PROBE_TTL_S:
        return _STATE["ok"]
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
    ok = bool(result.get("ok", False))
    _STATE.update(ok=ok, t=time.monotonic())
    if not ok:
        _STATE["demoted"] = True
    return ok


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
            # os._exit skips every later atexit handler and any buffered
            # writers still open: flush what we know about (logging's file
            # sinks + stdio).  Stage code must close its output files via
            # context managers before interpreter exit (see docs/DESIGN.md)
            # so the guard cannot drop buffered output.
            try:
                import logging

                logging.shutdown()
            except Exception:
                pass
            try:
                sys.stdout.flush()
                sys.stderr.flush()
            except Exception:
                pass
            os._exit(_EXIT_CODE[0])

    atexit.register(_guard)


def best_compute_device():
    """The device grid-heavy stages should pin as jax.default_device:
    None (use the default) when healthy, else the first CPU device.

    The CPU lookup is itself budget-bounded: jax initializes ALL backends
    under one global lock (xla_bridge.backends()), so a probe thread that
    wedged INSIDE axon client creation still holds that lock and
    `jax.local_devices(backend="cpu")` would block forever on it.  In that
    state the process cannot run any jax computation at all — raise loudly
    instead of hanging (the exit guard armed by the timed-out probe keeps
    interpreter teardown safe)."""
    if device_transfer_ok():
        return None
    import threading

    result = {}

    def _lookup():
        try:
            import jax

            try:
                result["dev"] = jax.local_devices(backend="cpu")[0]
                return
            except RuntimeError:
                # a failed accelerator-plugin registration with
                # JAX_PLATFORMS pinned to it makes EVERY backends() call
                # raise ("Backend 'axon' is not in the list of known
                # backends") — the backend cache stays empty after the
                # failure, so overriding the platform list to cpu and
                # retrying initializes cleanly and the whole pipeline
                # proceeds on the CPU backend
                jax.config.update("jax_platforms", "cpu")
                result["dev"] = jax.local_devices(backend="cpu")[0]
        except Exception as e:  # no cpu backend — surfaced below
            result["err"] = e

    th = threading.Thread(target=_lookup, daemon=True)
    th.start()
    th.join(PROBE_BUDGET_S)
    if "dev" in result:
        return result["dev"]
    raise RuntimeError(
        "accelerator runtime wedged: the CPU-backend lookup did not "
        "complete (jax's backend-init lock is likely held by a stuck "
        "device probe); no jax computation is possible in this process"
        + (f" ({result['err']})" if "err" in result else "")
    )


def compute_context():
    """Context manager for a stage body: default device or CPU fallback."""
    import contextlib

    import jax

    dev = best_compute_device()
    if dev is None:
        return contextlib.nullcontext()
    return jax.default_device(dev)
