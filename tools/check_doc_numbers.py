#!/usr/bin/env python
"""Docs-vs-artifacts consistency checklist (VERDICT r4 #2).

Verifies that the headline numbers the docs claim match the artifacts
that back them. Run before the final commit of a round:

    python tools/check_doc_numbers.py

Checks (exit 1 on any mismatch):
  - the newest BENCH_r*.json headline value appears in README.md,
    BASELINE.md and DESIGN.md;
  - single-clip / train-step numbers from the same BENCH json appear in
    README.md when that json carries them;
  - README does not hardcode a stale test count ("NNN tests" is only
    allowed when tagged as a historical judge-run number);
  - every "artifacts/<dir>" path mentioned in README/DESIGN exists.
"""

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FAIL = []


def _read(name):
    with open(os.path.join(ROOT, name)) as fp:
        return fp.read()


def check(cond, msg):
    if cond:
        print(f"  ok: {msg}")
    else:
        print(f"MISMATCH: {msg}")
        FAIL.append(msg)


def main():
    benches = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    latest = None
    for path in reversed(benches):
        with open(path) as fp:
            data = json.load(fp)
        if data.get("parsed", {}).get("value"):
            latest = (os.path.basename(path), data["parsed"], data)
            break
    if latest is None:
        print("no BENCH_r*.json with a parsed headline; nothing to check")
        return
    name, parsed, data = latest
    value = parsed["value"]
    print(f"checking docs against {name} (headline {value})")

    readme = _read("README.md")
    baseline = _read("BASELINE.md")
    design = _read("DESIGN.md")

    sval = f"{value:g}"
    for doc, text in (("README.md", readme), ("BASELINE.md", baseline),
                      ("DESIGN.md", design)):
        check(sval in text, f"{doc} states the driver headline {sval}")

    # realism-line numbers, when the bench json carries them in its tail
    tail = data.get("tail", "")
    m = re.search(r'"serving_clip_x_realtime": ([0-9.]+)', tail)
    if m:
        check(m.group(1) in readme,
              f"README states single-clip {m.group(1)}x from {name}")
    m = re.search(r'"train_step_ms_device": ([0-9.]+)', tail)
    if m:
        check(m.group(1) in readme,
              f"README states train step {m.group(1)} ms from {name}")

    # stale hardcoded test counts: "NNN tests" must carry a provenance tag
    for mm in re.finditer(r"(\d{3,4})\s+tests", readme):
        ctx = readme[max(0, mm.start() - 200): mm.end() + 200]
        check("judge" in ctx or "historical" in ctx,
              f"README '{mm.group(0)}' is tagged as a judge-run/historical "
              "count, not a live claim")

    # every artifacts/ path the docs cite exists
    for doc, text in (("README.md", readme), ("DESIGN.md", design)):
        for mm in set(re.findall(r"artifacts/[A-Za-z0-9_./-]+", text)):
            p = os.path.join(ROOT, mm.rstrip("./"))
            check(os.path.exists(p), f"{doc} cites existing path {mm}")

    if FAIL:
        print(f"\n{len(FAIL)} mismatch(es)")
        sys.exit(1)
    print("\nall documented numbers match their artifacts")


if __name__ == "__main__":
    main()
