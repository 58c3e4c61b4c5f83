"""Per-op timing registry (reference source/timing.h: TimingData singleton +
Timings PbClass with display()/saveMean()).

The reference brackets every generated python wrapper with timing hooks
(pbPreparePlugin/pbFinalizePlugin). Under async XLA dispatch, per-op host
timing requires a device sync, which perturbs pipelining — so timing here is
opt-in: ``enableTimings()`` wraps the public op functions with a synced
timer; ``Timings().display()/saveMean()`` report accumulated means. For
accurate kernel-level numbers use jax.profiler traces instead (the
TPU-native answer, SURVEY.md §5.1).
"""

from __future__ import annotations

import time

import jax

_ACC: dict[str, list] = {}  # name -> [total_seconds, calls]
_ENABLED = [False]


def _record(name: str, dt: float):
    slot = _ACC.setdefault(name, [0.0, 0])
    slot[0] += dt
    slot[1] += 1


def _timed(name, fn):
    def wrapper(*args, **kwargs):
        if kwargs.pop("notiming", False) or not _ENABLED[0]:
            return fn(*args, **kwargs)
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        # sync: flush pending work so the measurement is real
        for a in list(args) + list(kwargs.values()):
            data = getattr(a, "data", None)
            if data is not None and hasattr(data, "block_until_ready"):
                try:
                    float(jax.numpy.sum(data.astype(jax.numpy.float32)))
                except Exception:
                    pass
                break
        _record(name, time.perf_counter() - t0)
        return out

    wrapper.__name__ = name
    wrapper.__doc__ = fn.__doc__
    return wrapper


def enableTimings():
    """Wrap the package's public ops with synced timers."""
    import mantaflow_tpu as m
    _ENABLED[0] = True
    for name in list(vars(m)):
        fn = getattr(m, name)
        if (callable(fn) and not isinstance(fn, type)
                and getattr(fn, "__module__", "").startswith("mantaflow_tpu")
                and not getattr(fn, "_is_timed", False)
                and name not in ("enableTimings", "mantaMsg",
                                 "setDebugLevel")):
            w = _timed(name, fn)
            w._is_timed = True
            setattr(m, name, w)


class Timings:
    """Scene-facing registry (timing.h:50-56)."""

    def add(self, name: str, seconds: float):
        _record(name, seconds)

    def display(self):
        print("-- Timings (mean ms per call) " + "-" * 30)
        for name, (total, calls) in sorted(_ACC.items()):
            print(f"  {name:40s} {1000.0 * total / max(calls, 1):9.3f} ms "
                  f"({calls} calls)")

    def saveMean(self, filename: str):
        with open(filename, "w") as f:
            for name, (total, calls) in sorted(_ACC.items()):
                f.write(f"{name} {1000.0 * total / max(calls, 1):.6f}\n")

    def clear(self):
        _ACC.clear()
