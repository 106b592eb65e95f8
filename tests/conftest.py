"""Test harness: force an 8-device virtual CPU mesh before JAX initialises.

SURVEY.md §4: the TPU answer to "test multi-node without a cluster" — all
tests run on CPU with XLA_FLAGS=--xla_force_host_platform_device_count=8 so
sharding/collective paths execute for real.  Pallas kernels run in interpret
mode on CPU (handled inside the ops via backend checks / interpret fallbacks).
"""

import os

# Force CPU even when the shell presets JAX_PLATFORMS (e.g. 'axon' tunnels a
# real TPU — tests must not depend on it, and the tunnel is slow).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")


# ---------------------------------------------------------------------------
# Multi-process coverage surfacing (VERDICT r3 #7): the 2-process tests skip
# (with evidence) when Gloo's 30s rendezvous starves on a contended box — a
# green suite could silently contain ZERO multi-process coverage.  Record the
# per-test outcome of tests/test_multiprocess.py into MP_STATUS.json at the
# repo root so the round artifacts capture it, and keep a consecutive
# all-skipped counter across sessions so starvation can't read as durable
# green: after 3 consecutive fully-skipped sessions the suite FAILS.

_MP_RESULTS = {}
_MP_SKIP_ESCALATION = 3
# The full MP surface; the streak only moves when ALL of these ran, so
# partial `-k`/single-test invocations on a contended box can neither
# inflate the starvation streak nor launder it back to zero.
# (Pinned against the module by
#  test_multiprocess.py::test_mp_required_set_matches_module.)
MP_REQUIRED = frozenset({
    "test_two_process_training",
    "test_two_process_fsdp_training",
    "test_two_process_fsdp_orbax_bitidentity",
})


# Whole-suite outcome surfacing (VERDICT r4 #1): round 4 ended with a red
# suite committed unrun.  Record every non-passing test + aggregate counts
# into SUITE_STATUS.json at the repo root so an end-of-round snapshot with a
# red (or partial) suite is visible in the round record.
_SUITE_COUNTS = {"passed": 0, "failed": 0, "skipped": 0, "error": 0}
_SUITE_BAD = []  # nodeids of failures/errors


def pytest_runtest_logreport(report):
    if report.when == "call" or (report.when == "setup" and report.outcome != "passed"):
        _SUITE_COUNTS[report.outcome] = _SUITE_COUNTS.get(report.outcome, 0) + 1
        if report.outcome == "failed":
            _SUITE_BAD.append(report.nodeid)
    elif report.failed:  # setup/teardown error on an otherwise-run test
        _SUITE_COUNTS["error"] += 1
        _SUITE_BAD.append(report.nodeid)
    if "test_multiprocess.py" not in report.nodeid:
        return
    if report.when == "call" or (report.when == "setup" and report.skipped):
        _MP_RESULTS[report.nodeid.split("::")[-1]] = report.outcome


def pytest_sessionfinish(session, exitstatus):
    import json
    import time

    _root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        n_collected = session.testscollected
    except AttributeError:
        n_collected = sum(_SUITE_COUNTS.values())
    args = list(getattr(session.config, "invocation_params").args)
    suite_status = {
        "exitstatus": int(getattr(exitstatus, "value", exitstatus)),
        "collected": n_collected,
        "counts": dict(_SUITE_COUNTS),
        "failed_tests": sorted(set(_SUITE_BAD)),
        "green": int(getattr(exitstatus, "value", exitstatus)) == 0
        and not _SUITE_BAD,
        "args": args,
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    # A GREEN partial session (single-test smoke, -k filter) must not clobber
    # a fuller record: the round artifact should show the most complete
    # evidence, and a green 1-test run could otherwise bury a red full-suite
    # record.  Red sessions ALWAYS overwrite (visibility is the point), and so
    # do whole-suite invocations (a bare ``tests/`` target, no -k/-m/::), even
    # if the suite shrank since the previous record.
    path = os.path.join(_root, "SUITE_STATUS.json")
    looks_full = (
        any(a.rstrip("/").endswith("tests") for a in args)
        and not any("::" in a or a in ("-k", "-m") for a in args)
    )
    # "Red" = something actually failed/errored/aborted (exit 1/2/3) — NOT
    # exit 5 (no tests collected, e.g. a -k filter matching nothing), which
    # carries no evidence and would clobber a real record with noise.
    red = bool(_SUITE_BAD) or suite_status["exitstatus"] in (1, 2, 3)
    write = red or looks_full
    if not write:
        try:
            with open(path) as f:
                write = n_collected >= json.load(f).get("collected", 0)
        except (OSError, ValueError):
            write = True
    if write:
        try:
            with open(path, "w") as f:
                json.dump(suite_status, f, indent=1, sort_keys=True)
                f.write("\n")
        except OSError:
            pass

    if not _MP_RESULTS:
        return

    path = os.path.join(_root, "MP_STATUS.json")
    try:
        with open(path) as f:
            prev_streak = json.load(f).get("consecutive_all_skipped", 0)
    except (OSError, ValueError):
        prev_streak = 0
    full_session = MP_REQUIRED <= set(_MP_RESULTS)
    # Judge the streak over the REQUIRED set only: the module also contains
    # always-running meta-tests (e.g. test_mp_required_set_matches_module)
    # whose 'passed' outcome must not launder a fully-starved Gloo session
    # back to streak 0 (ADVICE r4, medium).
    all_skipped = full_session and all(
        _MP_RESULTS.get(n) == "skipped" for n in MP_REQUIRED)
    if full_session:
        streak = prev_streak + 1 if all_skipped else 0
    else:
        streak = prev_streak  # partial run: no evidence either way
    status = {
        "tests": dict(sorted(_MP_RESULTS.items())),
        "all_skipped": all_skipped,
        "full_mp_session": full_session,
        "consecutive_all_skipped": streak,
    }
    try:
        with open(path, "w") as f:
            json.dump(status, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError:
        pass
    if full_session and streak >= _MP_SKIP_ESCALATION:
        session.exitstatus = 1
        print(f"\nFAIL: multi-process tests skipped {streak} sessions in a row "
              f"(see {path}) — coverage has silently evaporated.")
