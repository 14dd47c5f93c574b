"""bench.py contract test: the driver runs `python bench.py` at the end
of every round, captures only the TAIL of stdout, and parses the LAST
JSON line.  Round 4 lost its headline when the single output line
outgrew the ~2,000-byte capture (BENCH_r04 `parsed: null`), so the
contract is now: detail rows on their own earlier `{"bench_detail":
...}` line, final line a compact headline under bench.HEADLINE_CAP
bytes that parses ALONE.  `--smoke` runs the same plumbing on the CPU
backend at tiny sizes, so a broken bench (import error, renamed field,
non-JSON noise on stdout, oversized headline) fails here instead of at
driver time."""
import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
from bench import HEADLINE_CAP  # noqa: E402


def test_bench_smoke_json_contract():
  out = subprocess.run(
      [sys.executable, str(REPO / "bench.py"), "--smoke"],
      capture_output=True, text=True, timeout=600, check=True)
  lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
  assert lines, f"no stdout lines: {out.stdout!r}"
  # every stdout line is valid JSON on its own (no interleaved noise)
  parsed = [json.loads(l) for l in lines]
  # the LAST line alone is the driver-facing headline and fits the
  # driver's bounded tail capture with room to spare
  head = parsed[-1]
  assert len(lines[-1]) <= HEADLINE_CAP, len(lines[-1])
  for key in ("metric", "value", "unit", "vs_baseline", "detail"):
    assert key in head, key
  assert head["unit"] == "patches/sec"
  assert head["value"] > 0
  assert head["vs_baseline"] > 0
  # the detail rows ride on their own earlier line
  assert any("bench_detail" in p for p in parsed[:-1]), lines
