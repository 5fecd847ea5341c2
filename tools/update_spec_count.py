#!/usr/bin/env python3
"""Patch SURVEY.md's spec-count line from an actual `sbt test` summary.

Usage:  sbt -batch test | tee /tmp/sbt_test.log ; tools/update_spec_count.py /tmp/sbt_test.log

Reads the ScalaTest run summary ("Total number of tests run: N" /
"Suites: completed M") and rewrites the line in SURVEY.md tagged with
<!-- spec-count:auto -->. Exists because hand-written counts drifted twice
(rounds 4 and 5, each off by one); the judge asked for the number to be
generated, not typed.
"""
import re
import sys
import pathlib

def main() -> int:
    log_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sbt_test.log"
    log = pathlib.Path(log_path).read_text()
    tests = re.findall(r"Total number of tests run: (\d+)", log)
    suites = re.findall(r"Suites: completed (\d+), aborted (\d+)", log)
    failed = re.findall(r"Tests: succeeded (\d+), failed (\d+)", log)
    if not tests or not suites or not failed:
        print(f"no ScalaTest summary found in {log_path}", file=sys.stderr)
        return 1
    n_tests, (n_suites, n_aborted), (_, n_failed) = tests[-1], suites[-1], failed[-1]
    if n_aborted != "0" or n_failed != "0":
        print(f"suite not green (failed={n_failed}, aborted={n_aborted}); not patching", file=sys.stderr)
        return 1
    survey = pathlib.Path(__file__).resolve().parent.parent / "SURVEY.md"
    text = survey.read_text()
    line = (f"- ScalaTest: **{n_tests} specs green across {n_suites} suites** "
            f"<!-- spec-count:auto -->")
    new, n_subs = re.subn(r"^- ScalaTest: \*\*\d+ specs green across \d+ suites\*\* <!-- spec-count:auto -->$",
                          line, text, flags=re.M)
    if n_subs != 1:
        print(f"expected exactly 1 tagged spec-count line in SURVEY.md, found {n_subs}", file=sys.stderr)
        return 1
    survey.write_text(new)
    print(f"SURVEY.md spec count -> {n_tests} tests / {n_suites} suites")
    return 0

if __name__ == "__main__":
    sys.exit(main())
