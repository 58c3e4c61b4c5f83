"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests exercise multi-chip paths without TPU hardware.

The environment pins JAX_PLATFORMS to the TPU backend and a sitecustomize on
PYTHONPATH may import jax before this file runs, so overriding the env var
alone is not enough — override jax.config too (safe as long as no backend
has been initialized yet).
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the GSPMD-partitioned step programs (e.g.
# the 8-way sharded window-advection step) take minutes of XLA CPU compile
# on this 1-core host; cache them across pytest runs.
_cache_dir = os.environ.get("JAX_TEST_CACHE_DIR",
                            os.path.expanduser("~/.cache/jax_test_cache"))
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


# ---------------------------------------------------------------------------
# Test tiers (SURVEY §4 / VERDICT r4 weak #7): the full 200+ case suite
# needs ~1 h on a 1-core host (golden matrix + sharded-mesh XLA compiles).
# Modules/cases below are auto-marked `slow`; `pytest -m "not slow"` is the
# <5-min smoke tier and still covers every op module at reduced sizes.
import pytest  # noqa: E402

_SLOW_MODULES = {
    "test_ref_goldens",        # 37-scene reference-binary golden matrix
    "test_golden_regression",  # two-tier golden harness over testdata
    "test_scenes_run",         # 26 end-to-end scene scripts
    "test_flip_sharded",       # 8-device mesh compiles (minutes on 1 core)
    "test_ml",                 # worked ML examples end-to-end
    "test_mlflip",             # ML-FLIP train+infer loop
    "test_flip_bucket_auto",   # PPC escalation drivers (many recompiles)
    "test_zflip",              # fork method loops end-to-end
}
_SLOW_NAME_PARTS = (
    "with_obstacle",           # bucketed-vs-flat obstacle equality (~9 min)
    "interior_obstacle",
    "sharded",                 # any sharded-mesh case outside its module
)
# individually heavy cases (measured --durations on the 1-core host);
# their modules keep at least one fast case each
_SLOW_TESTS = {
    "test_graft_entry",                          # 355 s (driver-gated too)
    "test_multi_resolution_single_process",      # 46 s
    "test_fused_advect_blend_matches_sequence",  # 44 s
    "test_pallas_advect_rebin_match_xla",        # 41 s
    "test_full_step_matches_flat",               # 34 s
    "test_bucketed_guards",                      # 32 s
    "test_whitewater_pipeline",                  # 31 s
    "test_fast_smoke_model_close_to_faithful",   # 24 s
    "test_particle_surface_turbulence",          # 22 s
    "test_correct19_spreads_clumped_particles",  # 22 s
    "test_finalize_buckets_closes_blend_lag",    # 20 s
    "test_simpleplume_3d",                       # 18 s
    "test_mg_converges_in_few_iterations",       # 16 s
    "test_fused_p2g_union_matches_separate",     # 15 s
    "test_interpol4d_roundtrip",                 # 15 s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        base = item.name.split("[")[0]
        if (mod in _SLOW_MODULES or base in _SLOW_TESTS
                or any(p in item.name for p in _SLOW_NAME_PARTS)):
            item.add_marker(pytest.mark.slow)
