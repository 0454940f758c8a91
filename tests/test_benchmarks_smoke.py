"""Smoke tests for the host-side benchmark/accounting scripts so they
don't rot: they must run end-to-end on tiny inputs and print their JSON."""

import json
import subprocess
import sys


def test_halo_accounting_smoke():
    proc = subprocess.run(
        [sys.executable, "benchmarks/halo_accounting.py",
         "--points", "128", "--graphs", "1", "--mps", "2"],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-500:]
    rows = [json.loads(ln) for ln in proc.stdout.splitlines()
            if ln.startswith("{")]
    mp_rows = [r for r in rows if "mp" in r]
    assert len(mp_rows) == 1
    r = mp_rows[0]
    assert r["mp"] == 2 and r["predicted_efficiency"] > 0
    assert r["wire_mb_per_chip"] > 0 and r["plan_s"] >= 0


def test_preprocessing_bench_importable():
    # pure import check (running it is minutes-long); guards path rot
    import importlib.util
    for mod in ("benchmarks/preprocessing_bench.py",
                "benchmarks/nuscenes_e2e.py",
                "benchmarks/convergence.py"):
        spec = importlib.util.spec_from_file_location("smoke_" + mod, mod)
        assert spec is not None
