"""Driver entry points: trace/compile checks on CPU."""

import subprocess
import sys


def test_entry_traces():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    import jax

    fn, args = ge.entry()
    # eval_shape = full trace without compile; validates shapes/dtypes.
    out = jax.eval_shape(fn, *args)
    kc, vc, pool, frame = out
    assert frame.shape == (8, 16)


def test_dryrun_multichip_subprocess():
    # Run in a subprocess: dryrun flips jax_platforms before backend init,
    # which must not interfere with this process's initialized CPU backend.
    r = subprocess.run(
        [sys.executable, "/root/repo/__graft_entry__.py"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # both engines (bf16 + production int8) served frames through
    # TTSEngine.step() on the (data=2, model=4) mesh
    assert "bf16 engine" in r.stdout and "OK" in r.stdout
    assert "int8 engine (burst->fallback)" in r.stdout
