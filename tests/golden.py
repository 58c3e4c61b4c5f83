"""Golden-data regression helpers (reference tools/tests/helperInclude.py
pattern, SURVEY.md §4): two-tier thresholds over abs-max per-cell diffs vs
stored .uni goldens.

- MANTA_GEN_TEST_DATA=1 regenerates the goldens (tests/testdata/*.uni);
- normal runs load the golden and compare with gridMaxDiff semantics
  (grid.cpp:437): a loose threshold for cross-platform float runs and a
  strict one for same-platform reruns.
"""

from __future__ import annotations

import os

import numpy as np

TESTDATA = os.path.join(os.path.dirname(__file__), "testdata")


def _platform_tag() -> str:
    import jax
    return f"platform={jax.default_backend()}"


def do_test_grid(name: str, grid, threshold: float,
                 threshold_strict: float = 1e-5) -> bool:
    """doTestGrid equivalent for scene-API grids (and raw arrays).

    Two-tier contract (helperInclude.py:16-47): the loose threshold always
    applies; the STRICT threshold is additionally ENFORCED when the golden's
    header records it was generated on the current JAX backend — the
    same-platform analog of the reference's double-build strict tier.
    Goldens written before platform stamping fall back to loose-only."""
    from mantaflow_tpu.io import uni as uio
    os.makedirs(TESTDATA, exist_ok=True)
    path = os.path.join(TESTDATA, name + ".uni")
    arr = np.asarray(grid.data if hasattr(grid, "data") else grid)

    if os.environ.get("MANTA_GEN_TEST_DATA") == "1":
        uio.write_grid_uni(path, arr,
                           info=f"mantaflow-tpu {_platform_tag()}")
        return True
    if not os.path.exists(path):
        # a missing golden is a FAILURE (a deleted/renamed file must not
        # silently turn the regression into a no-op); regenerate explicitly
        # with MANTA_GEN_TEST_DATA=1
        raise FileNotFoundError(
            f"golden data missing: {path} (run with MANTA_GEN_TEST_DATA=1 "
            "to generate)")

    golden, header = uio.read_grid_uni(path)
    golden = np.asarray(golden, np.float64)
    diff = np.abs(arr.astype(np.float64) - golden).max()
    info = header.get("info", b"").split(b"\0", 1)[0].decode("ascii",
                                                            "replace")
    same_platform = _platform_tag() in info
    tier = threshold_strict if same_platform else threshold
    ok = diff <= min(threshold, tier)
    print(f"golden[{name}]: maxDiff={diff:.3e} loose<={threshold:g} "
          f"strict<={threshold_strict:g} "
          f"[{'strict' if same_platform else 'loose'} tier enforced] "
          f"-> {'OK' if ok else 'FAIL'}")
    return ok
