"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Must set platform flags before the first jax import anywhere in the test
process.
"""

import os
import sys

# Force CPU: the ambient environment sets JAX_PLATFORMS=axon (the real TPU
# tunnel), which would make every eager op a network round trip.  Tests run
# on a virtual 8-device CPU mesh; the benchmark uses the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's fusion emitter contracts f32 mul+add chains into FMAs (it
# compiles with allow-excess-precision), which diverges from the reference
# decoder's strictly-rounded arithmetic by 1 ulp — enough to flip the
# IDCT's trunc() rounding.  Disabling the fusion pass restores strict
# rounding so CPU tests validate reference semantics.  The TPU backend is
# verified separately on hardware (see bench.py FMA regression).
if "xla_disable_hlo_passes" not in _flags:
    _flags = (_flags + " --xla_disable_hlo_passes=fusion").strip()
os.environ["XLA_FLAGS"] = _flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores JAX_PLATFORMS from the environment; pin the
# platform through jax.config before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_executable_accumulation():
    """Clear jax's compiled-executable caches at every module boundary.

    XLA:CPU segfaults inside backend_compile_and_load once enough jitted
    executables accumulate in one process (hundreds of compiles across a
    full-suite run; reproduced 3/3 in round 3 at test_real_corpus, and
    again at test_parallel after round 3 added more compiling tests
    earlier in the alphabet).  The crash never reproduces for a module
    run alone, and the native layer is ASan-clean — the root cause is
    XLA-internal resource accumulation.  Dropping the caches per module
    bounds the accumulation to one module's compiles at the cost of
    cross-module recompiles."""
    jax.clear_caches()
    yield


# ---------------------------------------------------------------------------
# Slow-test split (VERDICT r4 #8): the full differential suite costs ~50 min
# on this 1-core box (XLA:CPU compiles dominate; the per-module cache clear
# above makes them unavoidable).  The heaviest long-form differentials —
# each a deeper replay of behavior a faster test in the same area already
# pins — are marked `slow` and EXCLUDED FROM THE DEFAULT RUN so the green
# signal stays cheap (~<20 min) and keeps getting run:
#
#     python -m pytest tests/ -q                       # default: fast suite
#     python -m pytest tests/ -q -m slow               # long-form only
#     python -m pytest tests/ -q -m "slow or not slow" # everything
#                                                      # (milestones/rounds)
#
# Run the FULL suite before declaring a round/release done.  The list is
# curated from `--durations` profiles (r5: every entry >=21 s); keep it in
# sync when adding similarly heavy tests.
# ---------------------------------------------------------------------------

_SLOW_NODEID_PARTS = [
    "test_real_corpus.py",          # whole module: long-GOP corpus replays
    "test_soak.py",                 # whole module: 60-frame drift soaks
    "test_native.py::test_differential_fuzz_campaign_fused",
    "test_parallel.py::TestGraftEntry::test_dryrun_multichip",
    "test_pool.py::TestDeviceFrontendPool::test_mixed_resolutions_churn_bitexact",
    "test_pool.py::test_pool_mixed_resolutions",
    "test_pool.py::TestAdaptiveFrontend::test_simulated_slowdown_triggers_switch_bitexact",
    "test_pool.py::TestAdaptiveFrontend::test_manual_switch_preserves_membership_and_state",
    "test_pool.py::test_pool_resolution_switch_rebuckets",
    "test_pool.py::test_pool_randomized_churn_vs_singles",
    "test_pool.py::TestPoolMegastep::test_window_matches_sequential_mixed_buckets",
    "test_device_frontend.py::TestTransferBuckets::test_gop_spanning_buckets_matches_oracle",
    "test_device_frontend.py::TestDeviceFrontendDecoder::test_resolve_overflows_repairs_via_host",
    "test_device_frontend.py::TestDeviceFrontendDecoder::test_matches_host_batched_decoder",
    "test_device_frontend.py::TestDeviceFrontendDecoder::test_unroll_factor_is_semantics_preserving",
    "test_device_frontend.py::TestDeviceFrontendDecoder::test_gop_matches_single_stream_oracle",
    "test_device_frontend.py::TestStandardStreams::test_decoder_end_to_end_standard",
    "test_device_frontend.py::TestStandardStreams::test_gob_resync_routes_in_automaton",
    "test_device_frontend.py::TestRaggedPayload::test_rich_gops_match_rows",
    "test_device_frontend.py::TestRaggedPayload::test_absent_overcap_and_error_lanes",
    "test_device_frontend.py::TestCarriedOptionsGate::test_recycled_slot_does_not_inherit_status",
    "test_device_frontend.py::TestDecodeStepsWindow::test_window_matches_sequential_steps",
    "test_device_frontend.py::TestDecodeStepsWindow::test_window_absent_lane_and_block_error",
    "test_device_frontend.py::TestDecodeStepsWindow::test_window_overflow_repair",
    # r5 durations pass 2 (each >=40 s; a faster pin per area stays in the
    # default run — test_window_buffer_reuse_smaller_second_window for the
    # window-state hazards, test_gob_resync_off_by_one_skip_bound +
    # test_soft_mcbpc_tail_fills for GOB resync, per-stream isolation via
    # test_robustness's batched flavors):
    "test_device_frontend.py::TestDecodeStepsWindow::test_single_step_invalidates_window_state",
    "test_device_frontend.py::TestDecodeStepsWindow::test_resolve_overflows_delegates_to_window",
    "test_device_frontend.py::TestDeviceFrontendDecoder::test_corrupt_stream_isolated",
    "test_device_frontend.py::TestStandardStreams::test_gob_resync_differential_sweep",
    "test_adversarial.py::test_pei_stuffing_gop_three_frontends_agree",
    "test_parallel.py::TestSplitPackedTransport::test_720p_split_equals_dense",
    "test_parallel.py::TestSplitPackedTransport::test_split_transport_sharded",
    "test_parallel.py::TestStandardH263Batched::test_standard_streams_batched",
    "test_parallel.py::TestDelta24Transport::test_d24_large_picture_equals_split",
    "test_robustness.py::TestStandardBatchedRobustness::test_corrupt_stream_raises_and_state_survives",
    "test_checkpoint.py::test_batched_sticky_state_survives",
    "test_fused_transport.py::TestFusedParity::test_bucket_ladder_cut",
    "test_fused_transport.py::TestFusedParity::test_varied_mv_flip_matches_scalar_reference",
]


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-form differential (excluded from the "
        "default run; see conftest)")
    # Default to excluding slow tests ONLY when the user gave no -m of
    # their own (a CLI -m overrides this entirely).
    if not config.option.markexpr:
        config.option.markexpr = "not slow"


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(part in item.nodeid for part in _SLOW_NODEID_PARTS):
            item.add_marker(pytest.mark.slow)
