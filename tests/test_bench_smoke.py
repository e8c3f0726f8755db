"""Structural protection for the driver bench contract (VERDICT r3 #1).

Round 3 lost its headline number because ``bench.py`` ran out of the
driver's time budget before printing any JSON. The fix was structural
(print the headline immediately after the timed loop AND again as the
final line; budget-gate the optional phases) — this test pins that
contract by running ``bench.py`` end-to-end in a subprocess on CPU with
tiny shapes and asserting what the driver needs:

- exit code 0,
- the LAST stdout line parses as the headline JSON
  (``metric == "wav_to_vertices_throughput"``, positive value),
- the headline was ALSO printed early (before optional phases), so a
  mid-run kill after the timed loop still leaves a capturable number.

Runs the XLA paths (``SDFA_PALLAS_*=0``) — the Mosaic kernels have their
own interpret-mode parity tests; this test is about bench.py's plumbing.
"""

import json
import os
import subprocess
import sys
import unittest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WRAPPER = """
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
import bench
bench.main()
"""


class TestBenchSmoke(unittest.TestCase):
    def test_headline_json_is_last_line_and_printed_early(self):
        env = dict(
            os.environ,
            BENCH_WAIT_BACKEND="0",
            BENCH_SECONDS="1",
            BENCH_CLIPS="2",
            BENCH_ITERS="1",
            BENCH_MFU="0",
            BENCH_REALISM="0",
            BENCH_PIPELINED="0",
            BENCH_TRAIN_BENCH="0",
            SDFA_PALLAS_BILSTM="0",
            SDFA_PALLAS_FREQ_LSTM="0",
            SDFA_PALLAS_SOLVE="0",
        )
        r = subprocess.run(
            [sys.executable, "-c", _WRAPPER.format(repo=_REPO)],
            capture_output=True, text=True, timeout=840, env=env,
            cwd="/tmp",
        )
        self.assertEqual(r.returncode, 0, msg=r.stderr[-2000:])

        lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
        self.assertTrue(lines, msg="no stdout at all")

        # the driver takes the last JSON line
        tail = json.loads(lines[-1])
        self.assertEqual(tail["metric"], "wav_to_vertices_throughput")
        self.assertGreater(tail["value"], 0.0)
        self.assertEqual(tail["unit"], "x_realtime_per_chip")
        self.assertIn("vs_baseline", tail)
        # explicit SDFA_PALLAS_*=0 must be reflected in the label
        self.assertNotEqual(tail.get("kernels"), "fused")

        # the headline must appear at least twice: once right after the
        # timed loop (early capture) and once as the final line
        headlines = [
            ln for ln in lines
            if '"wav_to_vertices_throughput"' in ln
        ]
        self.assertGreaterEqual(len(headlines), 2, msg=r.stdout[-2000:])
        first = json.loads(headlines[0])
        self.assertEqual(first["value"], tail["value"])


if __name__ == "__main__":
    unittest.main()
