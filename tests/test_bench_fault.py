"""Kill-tests for bench.py's fault tolerance (round-4 VERDICT weak #1).

Round 4's driver bench capture died to ONE transient axon RPC fault at the
first device op (BENCH_r04.json rc=1, parsed=null).  These tests run the
REAL bench.py (tiny sizes, CPU platform) with injected faults and assert
the contract: a parseable JSON line is ALWAYS emitted and transient faults
are retried, not fatal.

Reference protocol analog: /root/reference/benchmarks/sim_benchmark.py:107-151
(the committed harness whose capture must survive the environment).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, 'bench.py')


def _run_bench(tmp_path, fault_mode=None, attempts='3'):
    env = dict(os.environ)
    env.update({
        'RTT_BENCH_CPU': '1',
        'RTT_BENCH_N': '2000',
        'RTT_BENCH_CHAIN': '4',
        'RTT_BENCH_GRAD_CHAIN': '2',
        'RTT_BENCH_REPEATS': '2',
        'RTT_BENCH_ATTEMPTS': attempts,
    })
    if fault_mode is not None:
        env['RTT_BENCH_FAULT'] = str(tmp_path / 'fault_marker')
        if fault_mode == 'hard':
            env['RTT_BENCH_FAULT_MODE'] = 'hard'
    proc = subprocess.run([sys.executable, BENCH], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=600)
    lines = [ln for ln in proc.stdout.strip().splitlines()
             if ln.startswith('{')]
    assert lines, f'no JSON line emitted:\n{proc.stdout}\n{proc.stderr}'
    return proc, json.loads(lines[-1])


def _assert_core_metrics(parsed):
    assert parsed['unit'] == 'rays/s'
    assert parsed['value'] is not None and parsed['value'] > 0
    assert parsed['vs_baseline'] is not None
    assert 'partial' not in parsed
    assert parsed['spot_rms'] == pytest.approx(0.169, abs=0.01)


def test_bench_clean_run(tmp_path):
    proc, parsed = _run_bench(tmp_path)
    assert proc.returncode == 0
    _assert_core_metrics(parsed)


def test_bench_survives_transient_fault(tmp_path):
    """Transient INTERNAL fault at the FIRST device op -> in-process retry
    recovers; full (non-partial) metrics still captured, rc=0."""
    proc, parsed = _run_bench(tmp_path, fault_mode='transient')
    assert proc.returncode == 0
    assert (tmp_path / 'fault_marker').exists()     # fault really fired
    _assert_core_metrics(parsed)


def test_bench_survives_child_crash(tmp_path):
    """Hard (non-transient) fault kills the child outright -> the parent's
    subprocess retry recovers on attempt 2."""
    proc, parsed = _run_bench(tmp_path, fault_mode='hard')
    assert proc.returncode == 0
    assert parsed.get('capture_attempts') == 2
    _assert_core_metrics(parsed)
