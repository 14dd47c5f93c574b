"""bench.py contract test: the driver runs `python bench.py` at the end
of every round and parses ONE JSON line from stdout.  `--smoke` runs the
same plumbing on the CPU backend at tiny sizes, so a broken bench (import
error, renamed field, non-JSON noise on stdout) fails here instead of at
driver time."""
import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_bench_smoke_json_contract():
  out = subprocess.run(
      [sys.executable, str(REPO / "bench.py"), "--smoke"],
      capture_output=True, text=True, timeout=600, check=True)
  lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
  assert len(lines) == 1, f"expected ONE stdout line, got: {out.stdout!r}"
  result = json.loads(lines[0])
  for key in ("metric", "value", "unit", "vs_baseline", "detail"):
    assert key in result, key
  assert result["unit"] == "patches/sec"
  assert result["value"] > 0
  assert result["vs_baseline"] > 0
