"""Driver-contract regression tests: bench.py and __graft_entry__.py.

These two files are executed by the build driver (compile checks,
multichip dry runs, end-of-round benchmarks); a regression in either
silently breaks the round, so they're exercised as subprocesses exactly
the way the driver runs them (at toy scale / on the CPU backend).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(code, env=None):
    full_env = dict(os.environ)
    full_env.update(env or {})
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=900, cwd=str(REPO), env=full_env)


def test_bench_emits_valid_json_line():
    r = _run(
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import bench; bench.main()",
        env={"BENCH_M": "2048", "BENCH_N": "256"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, key
    assert rec["unit"] == "s" and rec["value"] > 0
    assert rec["final_rel_obj_gap"] <= 2e-6


def test_graft_entry_and_dryrun():
    r = _run(
        "import jax;"
        "jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_num_cpu_devices', 8);"
        "import __graft_entry__ as g;"
        "fn, a = g.entry();"
        "jax.block_until_ready(jax.jit(fn)(*a));"
        "g.dryrun_multichip(8);"
        "g.dryrun_multichip(3)",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip(8): OK" in r.stdout
    assert "dryrun_multichip(3): OK" in r.stdout
