"""Test harness: force a TRUE host-CPU platform with 8 virtual devices so
multi-chip sharding can be validated without TPU hardware (SURVEY.md §4).

Environment quirk: this machine routes JAX through a remote-TPU shim
injected via ``PYTHONPATH=/root/.axon_site`` (a sitecustomize hook) that
also intercepts ``JAX_PLATFORMS=cpu``.  Replacing PYTHONPATH at interpreter
start disengages it, yielding a real host-CPU backend.  When the shim is
active, pytest is relaunched once in the clean environment (with output
capture suspended so the child's report reaches the terminal).

Set DIN_TPU_TESTS_ON_DEVICE=1 to skip all of this and run the tests on the
real device instead.
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SHIM_ACTIVE = ("axon" in os.environ.get("PYTHONPATH", "")
                and os.environ.get("DIN_TPU_TESTS_ON_DEVICE") != "1")

if os.environ.get("DIN_TPU_TESTS_ON_DEVICE") != "1":
    os.environ["PYTHONPATH"] = _REPO
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    # 8 virtual devices time-share ONE host core here, so an in-process
    # all-reduce rendezvous can legitimately take minutes on the heaviest
    # programs; XLA:CPU's stuck-collective watchdog would SIGABRT the whole
    # pytest process (xla::internal::AwaitAndLogIfStuck ->
    # InProcessCommunicator::AllReduce CHECK failure).  Widen it (one
    # shared implementation with the driver entry).
    os.environ["XLA_FLAGS"] = flags
    sys.path.insert(0, _REPO)
    from __graft_entry__ import _widen_cpu_collective_watchdog
    _widen_cpu_collective_watchdog()


def pytest_configure(config):
    if not _SHIM_ACTIVE:
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    rc = subprocess.call([sys.executable, "-m", "pytest"] + sys.argv[1:],
                         env=dict(os.environ))
    os._exit(rc)


import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
