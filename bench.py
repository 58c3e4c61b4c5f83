"""Benchmark: smoke (128^3) + FLIP dam (64^3) steps/sec on one TPU chip.

Mirrors the reference north-star configs (BASELINE.md): the 3D buoyant
plume at 128^3 (MacCormack + vorticity confinement + CG 1e-3) and the
64^3 FLIP breaking dam (flip01 pattern, discretization 2, RK4, 0.97
blend) — the exact configs measured for the C++ reference in
BASELINE_CPU.json.

Prints one JSON line per benchmark; the LAST line is the headline smoke
metric the driver records. vs_baseline divides by the reference's
multicore-extrapolated steps/sec (single-core measurement x11 ~= 16 cores
at 70% OpenMP scaling; see BASELINE_CPU.json) — the honest denominator.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _load_baseline():
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_CPU.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            return json.load(f)
    return {}


def _flip_setup(mode, dom, params):
    import jax

    from mantaflow_tpu.models import flip

    if mode == "flat":
        state = flip.make_dam_state(dom, params, discretization=2)
        step = jax.jit(lambda s: flip.flip_step(s, dom, params))
        n_parts = int(state.parts.capacity)
    else:
        # PPC start untuned (default capacity): the chunked overflow-safe
        # runner below owns escalation — no protocol tuning to dodge it
        state = flip.make_dam_state_bucketed(dom, params, discretization=2)
        step = jax.jit(lambda s: flip.flip_step_bucketed(s, dom, params))
        n_parts = int(state.buckets.count())
    return state, step, n_parts


def _time_steps(state, step, n_steps):
    state = step(state)
    float(state.vel.sum())  # sync
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = step(state)
    float(state.vel.sum())
    return n_steps / (time.perf_counter() - t0), state


def bench_flip(res=None, mode=None):
    """FLIP dam at 64^3 and 128^3 (BASELINE_CPU.json flip64/flip128).

    BENCH_FLIP_MODE=bucket runs the cell-bucketed particle pipeline
    (ops/flip_bucket.py + Pallas kernels — same op chain and numerics as
    the flat flip_step; tests/test_flip_bucket.py asserts step-for-step
    agreement), =flat the round-2 packed-row layout, =auto (default)
    3-step-probes both and reports the faster (falling back to flat if the
    bucketed path fails on this backend). At 128^3 the bucketed path is
    used directly: the flat path's per-particle gathers make even the
    3-step probe minutes-long at 3.8M particles.
    """
    from mantaflow_tpu.core.domain import Domain
    from mantaflow_tpu.models import flip

    if res is None:
        res = int(os.environ.get("BENCH_FLIP_RES", "64"))
    n_steps = int(os.environ.get("BENCH_STEPS", "10"))
    if mode is None:
        mode = os.environ.get("BENCH_FLIP_MODE", "auto")
    if os.environ.get("BENCH_FLIP_FLAT", "") == "1":  # legacy switch
        mode = "flat"

    dom = Domain(size=(res, res, res), dim=3)
    params = flip.FlipParams(gravity=(0.0, -0.003, 0.0), ghost_fluid=True,
                             cg_accuracy=1e-3,
                             ring_only_obstacles=True)  # dam: no interior obs

    import jax
    if mode == "auto" and jax.default_backend() == "tpu":
        # measured r4: bucket 104 vs flat ~6 steps/s at 64^3 on v5e — the
        # flat probe's compile alone costs minutes; skip it on TPU
        mode = "bucket"
        print("# auto: TPU -> bucket (flat probe skipped; see BASELINE.md)",
              file=sys.stderr, flush=True)
    if mode == "auto":
        setups = {"flat": _flip_setup("flat", dom, params)}
        rate_f, _ = _time_steps(*setups["flat"][:2], 3)
        try:
            setups["bucket"] = _flip_setup("bucket", dom, params)
            rate_b, st_b = _time_steps(*setups["bucket"][:2], 3)
            if int(st_b.buckets.dropped) != 0:
                rate_b = 0.0
        except Exception as e:  # bucketed path unavailable on this backend
            print(f"# bucketed probe failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            rate_b = 0.0
        mode = "bucket" if rate_b > rate_f else "flat"
        print(f"# auto: flat {rate_f:.2f} vs bucket {rate_b:.2f} steps/s "
              f"-> {mode}", file=sys.stderr, flush=True)
        # reuse the probe's compiled step (a fresh lambda would recompile)
        state, step, n_parts = setups[mode]
    else:
        state, step, n_parts = _flip_setup(mode, dom, params)
    steps_per_sec, state = _time_steps(state, step, n_steps)
    if mode == "bucket":
        assert int(state.buckets.dropped) == 0, "bucket overflow in bench"

    rec = _load_baseline()
    baseline = rec.get(f"flip{res}_steps_per_sec_multicore_est", 0.0)
    print(json.dumps({
        "metric": f"FLIP dam steps/sec @ {res}^3 (~{n_parts // 1000}k"
                  f" particles, {mode} layout, RK4+p2g+CG 1e-3 ghost fluid)"
                  " vs 16-core-CPU reference estimate",
        "value": round(steps_per_sec, 4),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / baseline, 3) if baseline else 0.0,
    }), flush=True)

    # developed-state row (the cold start favors early CG exits; see
    # BASELINE.md): 30 more steps, then time n_steps again. The bucketed
    # path runs BOTH through the chunked overflow-safe runner
    # (flip_run_bucketed_auto): n_steps-long lax.scan chunks with ONE host
    # sync per chunk — no per-step dispatch overhead, and a PPC escalation
    # (the dam piles up around step ~40) rebins and redoes the chunk
    # instead of dropping particles. The warmup chunks use the same chunk
    # length so the timed window reuses the compiled scan program.
    if os.environ.get("BENCH_DEVELOPED", "1") == "1":
        if mode == "bucket":
            # escalation rounds up to multiples of 8 (models/flip.py
            # _next_ppc): one 10->16 jump instead of a 14/18 chain
            state = flip.flip_run_bucketed_auto(state, dom, params, 30,
                                                check_every=n_steps)
            # settle: a chunk that completes at an unchanged PPC proves the
            # scan program for this PPC is compiled and no escalation is
            # pending — the timed window measures steady state, not a
            # recompile
            for _ in range(3):
                ppc_pre = state.buckets.ppc
                state = flip.flip_run_bucketed_auto(state, dom, params,
                                                    n_steps,
                                                    check_every=n_steps)
                if state.buckets.ppc == ppc_pre:
                    break
            t0 = time.perf_counter()
            state = flip.flip_run_bucketed_auto(state, dom, params, n_steps,
                                                check_every=n_steps)
            float(state.vel.sum())
            dev_rate = n_steps / (time.perf_counter() - t0)
        else:
            for _ in range(30):
                state = step(state)
            dev_rate, state = _time_steps(state, step, n_steps)
        if mode == "bucket" and int(state.buckets.dropped) != 0:
            print(f"# developed row: {int(state.buckets.dropped)} drops "
                  "survived the auto runner (CFL violation?)",
                  file=sys.stderr, flush=True)
        dev_base = rec.get(f"flip{res}_dev_steps_per_sec_multicore_est", 0.0)
        print(json.dumps({
            "metric": f"FLIP dam steps/sec @ {res}^3 DEVELOPED state "
                      f"(30+ warm steps, {mode} layout, chunked runner) "
                      "vs 16-core-CPU reference estimate",
            "value": round(dev_rate, 4),
            "unit": "steps/sec",
            "vs_baseline": round(dev_rate / dev_base, 3) if dev_base else 0.0,
        }), flush=True)


def main():
    import jax

    from mantaflow_tpu.core.domain import Domain
    from mantaflow_tpu.core.shapes import Sphere
    from mantaflow_tpu.models import smoke

    res = int(os.environ.get("BENCH_RES", "128"))
    n_warm = 1  # first compile at 128^3 takes ~3-5 min on the axon backend
    n_steps = int(os.environ.get("BENCH_STEPS", "10"))

    dom = Domain(size=(res, res, res), dim=3)
    # Pallas window advection (ops/advection_pallas.py): semi-Lagrangian
    # taps as fused VMEM kernels, window k = CFL bound; adaptive dt matches
    # the reference benchmark config (plume_adaptDt.py, CFL=3)
    params = smoke.SmokeParams(buoyancy=(0.0, -6e-4, 0.0),
                               vorticity_confinement=0.1,
                               cg_accuracy=1e-3,
                               window=3, use_pallas=True,
                               adaptive_dt=True, cfl=3.0, dt_max=2.0)
    if os.environ.get("BENCH_SMOKE_PC"):  # A/B the CG preconditioner
        from mantaflow_tpu.ops import pressure as prs
        import dataclasses as _dc
        pc = {"none": prs.PcNone, "mg": prs.PcMGStatic,
              "mgdyn": prs.PcMGDynamic}[os.environ["BENCH_SMOKE_PC"]]
        params = _dc.replace(params, preconditioner=pc) \
            if hasattr(params, "preconditioner") else params
    src = Sphere(center=(res / 2.0, res * 0.1, res / 2.0), radius=res * 0.14)
    state = smoke.make_smoke_state(dom, params, source_shape=src)

    step = jax.jit(lambda s: smoke.smoke_step(s, dom, params))

    def sync(s):
        # device->host transfer: reliable sync even where block_until_ready
        # is a no-op (experimental axon platform)
        return float(s.density.sum())

    for _ in range(n_warm):
        state = step(state)
    sync(state)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = step(state)
    sync(state)
    dt = time.perf_counter() - t0

    steps_per_sec = n_steps / dt

    # honest comparison point: the multicore-extrapolated reference
    # (this host exposes one CPU core; a 16-core box at ~70% OpenMP
    # scaling reaches ~11x single core — see BASELINE_CPU.json notes).
    rec = _load_baseline()
    baseline = rec.get("smoke128_steps_per_sec_multicore_est", 0.0)
    if not baseline:
        baseline = rec.get("smoke128_steps_per_sec", 0.0) * 11.0

    line = json.dumps({
        "metric": f"smoke sim steps/sec @ {res}^3 (MacCormack+vconf+CG 1e-3)"
                  " vs 16-core-CPU reference estimate",
        "value": round(steps_per_sec, 4),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / baseline, 3) if baseline else 0.0,
    })
    print(line, flush=True)

    # developed-state row (cold starts favor early CG exits; BASELINE.md)
    if os.environ.get("BENCH_DEVELOPED", "1") == "1":
        for _ in range(30):
            state = step(state)
        sync(state)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state = step(state)
        sync(state)
        dev_rate = n_steps / (time.perf_counter() - t0)
        dev_base = rec.get("smoke128_dev_steps_per_sec_multicore_est", 0.0)
        print(json.dumps({
            "metric": f"smoke sim steps/sec @ {res}^3 DEVELOPED state "
                      "(30 warm steps) vs 16-core-CPU reference estimate",
            "value": round(dev_rate, 4),
            "unit": "steps/sec",
            "vs_baseline": round(dev_rate / dev_base, 3) if dev_base else 0.0,
        }), flush=True)
    return line


if __name__ == "__main__":
    # smoke (the headline metric) runs FIRST so a FLIP-side failure can't
    # lose it; its JSON is re-printed LAST because the driver records the
    # last line.
    headline = main()
    if os.environ.get("BENCH_SKIP_FLIP", "") != "1":
        try:
            bench_flip()
        except Exception as e:
            print(f"# bench_flip failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
        if not os.environ.get("BENCH_FLIP_RES"):   # the 128^3 north-star row
            try:
                bench_flip(res=128, mode="bucket")
            except Exception as e:
                print(f"# bench_flip(128) failed: {type(e).__name__}: {e}",
                      file=sys.stderr, flush=True)
    print(headline, flush=True)
