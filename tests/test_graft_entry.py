"""Driver-gate regression tests for __graft_entry__.dryrun_multichip.

Round-1 VERDICT: the recorded multichip gate failed because the dryrun
assumed >= n visible devices instead of bootstrapping a virtual CPU
platform (the driver environment exposes ONE tunneled TPU).  These tests
pin both paths:

- inline: enough devices are visible (the conftest 8-CPU mesh) -> the
  dryrun body runs in-process.
- re-exec: more devices are requested than visible -> the dryrun re-runs
  itself in a subprocess with ``--xla_force_host_platform_device_count=N``
  (replacing any pre-existing count in XLA_FLAGS) and jax_platforms=cpu.
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax


def test_dryrun_inline_8(capsys):
    import __graft_entry__ as g

    assert len(jax.devices()) >= 8  # conftest forces the 8-CPU platform
    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "sharded grid eval ok" in out


def test_dryrun_reexec_when_too_few_devices(capsys):
    """Requesting more devices than visible must re-exec, not assert."""
    import __graft_entry__ as g

    assert len(jax.devices()) < 16
    g.dryrun_multichip(16)
    out = capsys.readouterr().out
    assert "dryrun_multichip(16)" in out
    assert "sharded grid eval ok" in out
