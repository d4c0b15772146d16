"""Stage-level resume points of the in-bench flagship trainer.

bench.py trains the flagship inside a 2400 s watchdog that SIGKILLs and
retries a hung attempt (bench._run_watchdog); scripts/train_bench_flagship
therefore persists each completed stage so attempt 2 resumes instead of
restarting from zero.  These tests pin the resume-point contract:
round-trip fidelity (f16 on the wire, f32 back on device), recipe-tag
gating, and corrupt-file tolerance.
"""

import importlib.util
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tbf():
    spec = importlib.util.spec_from_file_location(
        "train_bench_flagship",
        os.path.join(REPO, "scripts", "train_bench_flagship.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tiny_tree():
    # values exactly representable in f16 so the round trip is bit-equal
    return {
        "enc": {"w": np.full((3, 4), 0.5, np.float32),
                "b": np.arange(4, dtype=np.float32)},
        "stats": {"count": np.asarray(7, np.int32)},
    }


def test_stage_roundtrip(tbf, tmp_path):
    from rgbd_pifuhd_tpu.utils.options import Options

    path = str(tmp_path / "stage2_coarse")
    tree = _tiny_tree()
    tbf._save_stage(path, tree, Options(), tag="recipe-a")

    out = tbf._load_stage(path, "recipe-a")
    assert out is not None
    # f32 leaves crossed as f16 and came back f32; ints untouched
    assert out["enc"]["w"].dtype == np.float32
    np.testing.assert_array_equal(np.asarray(out["enc"]["w"]),
                                  tree["enc"]["w"])
    np.testing.assert_array_equal(np.asarray(out["enc"]["b"]),
                                  tree["enc"]["b"])
    assert int(out["stats"]["count"]) == 7


def test_stage_tag_mismatch_is_retrain(tbf, tmp_path):
    from rgbd_pifuhd_tpu.utils.options import Options

    path = str(tmp_path / "stage1_nml")
    tbf._save_stage(path, _tiny_tree(), Options(), tag="steps=800")
    assert tbf._load_stage(path, "steps=1200") is None  # different recipe
    assert tbf._load_stage(path, "steps=800") is not None


def test_stage_missing_or_corrupt_is_retrain(tbf, tmp_path):
    from rgbd_pifuhd_tpu.utils.options import Options

    path = str(tmp_path / "stage2_coarse")
    assert tbf._load_stage(path, "t") is None          # nothing there

    # a kill mid-save leaves a TAGLESS file -> ignored
    tbf._save_stage(path, _tiny_tree(), Options(), tag="t")
    os.remove(path + ".tag")
    assert tbf._load_stage(path, "t") is None

    # corrupt payload under a valid tag -> ignored, not a crash
    with open(path, "wb") as f:
        f.write(b"\x00garbage")
    with open(path + ".tag", "w") as f:
        f.write("t")
    assert tbf._load_stage(path, "t") is None


def test_supervised_reexecs_under_watchdog(tbf, monkeypatch):
    """--supervised re-builds the child argv from PARSED args (so argparse
    prefix abbreviations like --super cannot leak through and nest a
    second watchdog) and hands it to bench's progress-aware watchdog with
    probe=True (the per-attempt tunnel gate) instead of training
    in-process."""
    import sys

    sys.path.insert(0, REPO)
    import bench

    calls = {}

    def fake_watchdog(cmd=None, retry_sleep=30.0, probe=None):
        calls["cmd"] = cmd
        calls["probe"] = probe
        raise SystemExit(0)

    monkeypatch.setattr(bench, "_run_watchdog", fake_watchdog)
    monkeypatch.setattr(
        tbf, "train_flagship",
        lambda *a, **k: calls.setdefault("trained", True))
    for flag in ("--supervised", "--super"):   # exact + prefix abbrev
        calls.clear()
        monkeypatch.setattr(sys, "argv", [
            "train_bench_flagship.py", flag, "--steps-fine", "7"])
        with pytest.raises(SystemExit):
            tbf.main()
        assert "trained" not in calls          # the parent never trains
        assert calls["probe"] is True          # per-attempt tunnel gate
        cmd = calls["cmd"]
        # no supervised spelling (exact or abbreviated) survives into the
        # child, so the child trains instead of nesting another watchdog
        assert not any("--supervised".startswith(a) for a in cmd
                       if a.startswith("--s") and len(a) >= 3)
        i = cmd.index("--steps-fine")
        assert cmd[i + 1] == "7"
